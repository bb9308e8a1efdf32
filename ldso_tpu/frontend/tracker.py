"""Coarse tracker: frame-to-keyframe direct SE(3) image alignment on TPU.

Rebuild of the reference CoarseTracker (src/frontend/CoarseTracker.cc):
  * `make_tracker_ref`  <- makeCoarseDepthL0 (:258-438): splat active-point
    inverse depths into a level-0 map, pyramid-downsample, dilate, extract
    fixed-capacity per-level point lists.
  * `track_frame`       <- trackNewestCoarse (:61-217) + calcRes (:440-572)
    + calcGSSSE (:574-632): the FULL coarse-to-fine LM runs as ONE jitted
    device program. Per-point warp/residual work is batched over
    capacity-padded point lists with validity masks; the 8x8 Gauss-Newton
    system is one masked (N,8)x(N,8) matmul on the MXU; LM accept/reject and
    the level-cutoff adaptation are `lax.while_loop`s. Host sees only the
    final pose/status — no per-iteration host round-trips (the reference
    instead runs 6 SSE threads per iteration).
  * `track_frame_hypotheses`: the reference retries ~27 motion hypotheses
    sequentially (FullSystem.cc:189-311); here surviving hypotheses are
    vmapped and evaluated in parallel on device.

Parameter order: [tx ty tz wx wy wz a b] with Sophus se3 = [v, w]; the
increment scaling mirrors the reference exactly (SCALE_XI_ROT applies to
slots 0-2, SCALE_XI_TRANS to 3-5 — the reference's naming quirk, values
1.0 / 0.5: CoarseTracker.cc:141-145).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ldso_tpu.config import Config, SCALE_XI_ROT, SCALE_XI_TRANS, SCALE_A, SCALE_B
from ldso_tpu.camera.calib import Calibration
from ldso_tpu.frontend import affine
from ldso_tpu.math import lie
from ldso_tpu.ops.interp import bilinear, bilinear_packed, pack_taps
from ldso_tpu.ops.preprocess import FramePyramid

_LAMBDA_EXTRAPOLATION_LIMIT = 0.001


class TrackerRef(NamedTuple):
    """Reference-keyframe tracking template (CoarseTracker pc_* lists)."""
    # per level: (cap_l, 4) = [u, v, idepth, color], plus validity mask
    points: Tuple[jax.Array, ...]
    valid: Tuple[jax.Array, ...]
    ref_exposure: jax.Array       # scalar f32
    ref_aff: jax.Array            # (2,) [a, b] of the reference KF


# ---------------------------------------------------------------------------
# makeCoarseDepthL0
# ---------------------------------------------------------------------------

def _dilate(idep, wsum, diagonal: bool):
    """Fill holes from 4 neighbours (diagonal for fine levels, cross for
    coarse; CoarseTracker.cc:313-398)."""
    if diagonal:
        shifts = ((1, 1), (-1, -1), (1, -1), (-1, 1))
    else:
        shifts = ((0, 1), (0, -1), (1, 0), (-1, 0))
    s = jnp.zeros_like(idep)
    num = jnp.zeros_like(wsum)
    cnt = jnp.zeros_like(wsum)
    for dy, dx in shifts:
        w_n = jnp.roll(wsum, (-dy, -dx), axis=(0, 1))
        i_n = jnp.roll(idep, (-dy, -dx), axis=(0, 1))
        has = w_n > 0
        s = s + jnp.where(has, i_n, 0.0)
        num = num + jnp.where(has, w_n, 0.0)
        cnt = cnt + has.astype(idep.dtype)
    hole = (wsum <= 0) & (cnt > 0)
    idep = jnp.where(hole, s / jnp.maximum(cnt, 1.0), idep)
    wsum = jnp.where(hole, num / jnp.maximum(cnt, 1.0), wsum)
    return idep, wsum


@functools.partial(jax.jit, static_argnames=("calib", "caps"))
def make_tracker_ref(
    proj_u: jax.Array,        # (NP,) pixel u of each active point in the ref KF
    proj_v: jax.Array,        # (NP,)
    proj_idepth: jax.Array,   # (NP,) idepth in the ref KF
    weight: jax.Array,        # (NP,) splat weight sqrt(1e-3 / (HdiF + 1e-12))
    point_valid: jax.Array,   # (NP,) bool
    ref_dI: Tuple[jax.Array, ...],   # reference pyramid (levels of (H,W,3))
    ref_exposure: jax.Array,
    ref_aff: jax.Array,
    calib: Calibration,
    caps: Tuple[int, ...],
) -> TrackerRef:
    levels = calib.levels
    W0, H0 = calib.w[0], calib.h[0]
    proj_u = jnp.asarray(proj_u, jnp.float32)
    proj_v = jnp.asarray(proj_v, jnp.float32)
    proj_idepth = jnp.asarray(proj_idepth, jnp.float32)
    weight = jnp.asarray(weight, jnp.float32)

    # splat (CoarseTracker.cc:264-283)
    ui = jnp.clip(jnp.floor(proj_u + 0.5).astype(jnp.int32), 0, W0 - 1)
    vi = jnp.clip(jnp.floor(proj_v + 0.5).astype(jnp.int32), 0, H0 - 1)
    w_eff = jnp.where(point_valid, weight, 0.0)
    idep0 = jnp.zeros((H0, W0), jnp.float32).at[vi, ui].add(w_eff * proj_idepth)
    wsum0 = jnp.zeros((H0, W0), jnp.float32).at[vi, ui].add(w_eff)

    ideps, wsums = [idep0], [wsum0]
    for lvl in range(1, levels):
        ip, wp = ideps[-1], wsums[-1]
        Hp, Wp = ip.shape
        # reshape-reduce 2x2 sum: lane-strided slicing pays a relayout per
        # slice on TPU (same trick as ops.preprocess._downsample2)
        ideps.append(ip[:(Hp // 2) * 2, :(Wp // 2) * 2]
                     .reshape(Hp // 2, 2, Wp // 2, 2).sum(axis=(1, 3)))
        wsums.append(wp[:(Hp // 2) * 2, :(Wp // 2) * 2]
                     .reshape(Hp // 2, 2, Wp // 2, 2).sum(axis=(1, 3)))

    points = []
    valids = []
    for lvl in range(levels):
        idep, wsum = _dilate(ideps[lvl], wsums[lvl], diagonal=(lvl < 2))
        wl, hl = calib.w[lvl], calib.h[lvl]
        color = ref_dI[lvl][..., 0]
        xs = jax.lax.broadcasted_iota(jnp.int32, (hl, wl), 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (hl, wl), 0)
        border = (xs >= 2) & (xs < wl - 2) & (ys >= 2) & (ys < hl - 2)
        idep_n = idep / jnp.where(wsum > 0, wsum, 1.0)
        ok = border & (wsum > 0) & (idep_n > 0) & jnp.isfinite(color)

        cap = caps[lvl]
        flat_ok = ok.reshape(-1)
        idx = jnp.nonzero(flat_ok, size=cap, fill_value=0)[0]
        got = jnp.arange(cap) < jnp.sum(flat_ok)
        pu = jnp.take(xs.reshape(-1), idx).astype(jnp.float32)
        pv = jnp.take(ys.reshape(-1), idx).astype(jnp.float32)
        pid = jnp.take(idep_n.reshape(-1), idx)
        pc = jnp.take(color.reshape(-1), idx)
        points.append(jnp.stack([pu, pv, pid, pc], axis=-1))
        valids.append(got)

    return TrackerRef(points=tuple(points), valid=tuple(valids),
                      ref_exposure=jnp.asarray(ref_exposure, jnp.float32),
                      ref_aff=jnp.asarray(ref_aff, jnp.float32))


def make_tracker_ref_from_idepth(idepth_map: jax.Array, pyr: FramePyramid,
                                 calib: Calibration, caps: Tuple[int, ...],
                                 ref_exposure=1.0, ref_aff=(0.0, 0.0),
                                 stride: int = 1) -> TrackerRef:
    """Convenience: build a TrackerRef directly from a dense idepth map
    (used by tests/benchmarks with synthetic ground truth)."""
    H, W = idepth_map.shape
    ys, xs = jnp.meshgrid(jnp.arange(0, H, stride), jnp.arange(0, W, stride),
                          indexing="ij")
    u = xs.reshape(-1).astype(jnp.float32)
    v = ys.reshape(-1).astype(jnp.float32)
    idep = idepth_map[ys, xs].reshape(-1)
    valid = idep > 0
    w = jnp.ones_like(idep)
    return make_tracker_ref(u, v, idep, w, valid, pyr.dI,
                            jnp.float32(ref_exposure),
                            jnp.asarray(ref_aff, jnp.float32), calib, caps)


# ---------------------------------------------------------------------------
# trackNewestCoarse
# ---------------------------------------------------------------------------

def _calc_res(ref: TrackerRef, pyr_new: FramePyramid, lvl: int, T, aff_new,
              new_exposure, cutoff, calib: Calibration, cfg: Config,
              compute_flow: bool = True, packed=None):
    """Masked batched version of calcRes (CoarseTracker.cc:440-572).

    Returns per-point buffers + [E, numTerms, flowT, 0, flowRT, satRatio].
    compute_flow=False skips the three flow-indicator projections — the
    reference computes them only at level 0 (CoarseTracker.cc:506-540) and
    only level 0's value is consumed by the keyframe heuristic.
    packed: optional pack_taps(pyr_new.dI[lvl]) — ONE gather per point
    instead of four (built once per track_frame call, amortized over every
    LM iteration of the level); bit-identical to the 4-tap path."""
    fx, fy = calib.fx[lvl], calib.fy[lvl]
    cx, cy = calib.cx[lvl], calib.cy[lvl]
    wl, hl = calib.w[lvl], calib.h[lvl]
    pts = ref.points[lvl]
    pvalid = ref.valid[lvl]
    x, y, idep, color = pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3]

    Ki = jnp.asarray(calib.Ki(lvl), jnp.float32)
    R = T[:3, :3]
    t = T[:3, 3]
    RKi = (R @ Ki).astype(jnp.float32)

    rel = affine.from_to(ref.ref_exposure, new_exposure, ref.ref_aff, aff_new)
    a_rel, b_rel = rel[0], rel[1]

    ones = jnp.ones_like(x)
    p_ref = jnp.stack([x, y, ones], axis=-1)                     # (N,3)
    pt = p_ref @ RKi.T + t[None, :] * idep[:, None]              # (N,3)
    u = pt[:, 0] / pt[:, 2]
    v = pt[:, 1] / pt[:, 2]
    Ku = fx * u + cx
    Kv = fy * v + cy
    new_idepth = idep / pt[:, 2]

    inb = (Ku > 2) & (Kv > 2) & (Ku < wl - 3) & (Kv < hl - 3) & (new_idepth > 0)
    ok = pvalid & inb

    if packed is not None:
        hit = bilinear_packed(packed, Ku, Kv, 3)                 # (N,3)
    else:
        hit = bilinear(pyr_new.dI[lvl], Ku, Kv)                  # (N,3)
    finite = jnp.isfinite(hit[:, 0])
    ok = ok & finite

    residual = hit[:, 0] - (a_rel * color + b_rel)
    abs_r = jnp.abs(residual)
    hw = jnp.where(abs_r < cfg.huber_th, 1.0, cfg.huber_th / jnp.maximum(abs_r, 1e-12))
    sat = abs_r > cutoff
    max_energy = 2.0 * cfg.huber_th * cutoff - cfg.huber_th * cfg.huber_th

    e_term = jnp.where(sat, max_energy, hw * residual * residual * (2.0 - hw))
    E = jnp.sum(jnp.where(ok, e_term, 0.0))
    num_terms = jnp.sum(ok)
    num_sat = jnp.sum(ok & sat)

    good = ok & ~sat  # contributes to the GN system

    if compute_flow:
        # flow indicators (reference samples every 32nd point at lvl 0; we
        # use all points — same statistic, deterministic)
        ptT = p_ref @ Ki.T + t[None, :] * idep[:, None]
        ptT2 = p_ref @ Ki.T - t[None, :] * idep[:, None]
        pt3 = p_ref @ RKi.T - t[None, :] * idep[:, None]

        def _px(p):
            return fx * p[:, 0] / p[:, 2] + cx, fy * p[:, 1] / p[:, 2] + cy

        KuT, KvT = _px(ptT)
        KuT2, KvT2 = _px(ptT2)
        Ku3, Kv3 = _px(pt3)
        m = ok.astype(jnp.float32)
        n_flow = jnp.sum(m) + 0.1
        flow_t = jnp.sum(m * ((KuT - x) ** 2 + (KvT - y) ** 2
                              + (KuT2 - x) ** 2 + (KvT2 - y) ** 2)) / (2.0 * n_flow)
        flow_rt = jnp.sum(m * ((Ku - x) ** 2 + (Kv - y) ** 2
                               + (Ku3 - x) ** 2 + (Kv3 - y) ** 2)) / (2.0 * n_flow)
    else:
        flow_t = jnp.float32(0.0)
        flow_rt = jnp.float32(0.0)

    bufs = dict(u=u, v=v, idepth=new_idepth, dx=hit[:, 1], dy=hit[:, 2],
                residual=residual, hw=hw, color=color,
                good=good.astype(jnp.float32))
    stats = jnp.stack([E, num_terms.astype(jnp.float32), flow_t,
                       jnp.zeros_like(flow_t), flow_rt,
                       num_sat / jnp.maximum(num_terms, 1).astype(jnp.float32)])
    return bufs, stats


def _calc_gs(bufs, lvl, ref: TrackerRef, aff_new, new_exposure,
             calib: Calibration):
    """8x8 H, b from the warped buffers (calcGSSSE, CoarseTracker.cc:574-632).
    One masked (N,8)^T (N,9) matmul on the MXU."""
    fx, fy = calib.fx[lvl], calib.fy[lvl]
    rel = affine.from_to(ref.ref_exposure, new_exposure, ref.ref_aff, aff_new)
    a_rel = rel[0]
    b0 = ref.ref_aff[1]

    dxf = bufs["dx"] * fx
    dyf = bufs["dy"] * fy
    u, v, idep = bufs["u"], bufs["v"], bufs["idepth"]
    J = jnp.stack([
        idep * dxf,
        idep * dyf,
        -idep * (u * dxf + v * dyf),
        -(u * v * dxf + (1.0 + v * v) * dyf),
        u * v * dyf + (1.0 + u * u) * dxf,
        u * dyf - v * dxf,
        a_rel * (b0 - bufs["color"]),
        -jnp.ones_like(u),
    ], axis=-1)                                                   # (N,8)

    w = bufs["hw"] * bufs["good"]
    n = jnp.maximum(jnp.sum(bufs["good"]), 1.0)
    Jw = J * w[:, None]
    H = (Jw.T @ J) / n
    b = (Jw.T @ bufs["residual"]) / n

    scale = jnp.array([SCALE_XI_ROT] * 3 + [SCALE_XI_TRANS] * 3
                      + [SCALE_A, SCALE_B], jnp.float32)
    H = H * scale[:, None] * scale[None, :]
    b = b * scale
    return H, b, scale


def _solve_inc(H, b, lam, cfg: Config):
    """LM-damped 8x8 solve with the affine fix-mode variants
    (CoarseTracker.cc:106-137)."""
    Hl = H + jnp.diag(jnp.diag(H)) * lam
    eye = jnp.eye(8, dtype=H.dtype) * 1e-12  # guard exact singularity
    opt_a = cfg.affine_opt_mode_a >= 0
    opt_b = cfg.affine_opt_mode_b >= 0
    if opt_a and opt_b:
        inc = jnp.linalg.solve(Hl + eye, -b)
    elif not opt_a and not opt_b:
        inc6 = jnp.linalg.solve(Hl[:6, :6] + eye[:6, :6], -b[:6])
        inc = jnp.concatenate([inc6, jnp.zeros(2, H.dtype)])
    elif opt_a:
        inc7 = jnp.linalg.solve(Hl[:7, :7] + eye[:7, :7], -b[:7])
        inc = jnp.concatenate([inc7, jnp.zeros(1, H.dtype)])
    else:
        idx = jnp.array([0, 1, 2, 3, 4, 5, 7])
        Hs = Hl[jnp.ix_(idx, idx)]
        bs = b[idx]
        inc7 = jnp.linalg.solve(Hs + eye[:7, :7], -bs)
        inc = jnp.zeros(8, H.dtype).at[idx].set(inc7)
    return inc


def _level_block(ref, pyr_new, lvl, state, new_exposure, min_res_abort,
                 calib, cfg: Config, max_iterations: int, packed=None):
    """One pyramid level: cutoff adaptation + LM loop. Returns updated state
    and whether the level wants a repeat (cutoff > 1)."""
    T, aff, ok_flag, last_res, flow = state
    flow_here = (lvl == 0)

    # adapt cutoff until < 60% saturated (CoarseTracker.cc:89-94); the warp
    # buffers ride the carry so the final pass doubles as the LM-entry
    # linearization (one gather pass instead of the naive two)
    def cutoff_cond(c):
        cutoff_rep, _, stats = c
        return (stats[5] > 0.6) & (cutoff_rep < 50.0)

    def cutoff_body(c):
        cutoff_rep, _, _ = c
        cutoff_rep = cutoff_rep * 2.0
        bufs, stats = _calc_res(ref, pyr_new, lvl, T, aff, new_exposure,
                                cfg.coarse_cutoff_th * cutoff_rep, calib, cfg,
                                compute_flow=flow_here, packed=packed)
        return cutoff_rep, bufs, stats

    bufs0, stats0 = _calc_res(ref, pyr_new, lvl, T, aff, new_exposure,
                              cfg.coarse_cutoff_th, calib, cfg,
                              compute_flow=flow_here, packed=packed)
    cutoff_rep, bufs0, stats0 = jax.lax.while_loop(
        cutoff_cond, cutoff_body, (jnp.float32(1.0), bufs0, stats0))
    cutoff = cfg.coarse_cutoff_th * cutoff_rep

    H0, b0, scale = _calc_gs(bufs0, lvl, ref, aff, new_exposure, calib)

    def lm_cond(s):
        return (s["it"] < max_iterations) & (~s["done"])

    def lm_body(s):
        lam = s["lam"]
        inc = _solve_inc(s["H"], s["b"], lam, cfg)
        extrap = jnp.where(lam < _LAMBDA_EXTRAPOLATION_LIMIT,
                           jnp.sqrt(jnp.sqrt(_LAMBDA_EXTRAPOLATION_LIMIT
                                             / jnp.maximum(lam, 1e-12))), 1.0)
        inc = inc * extrap
        inc_scaled = inc * scale
        inc_scaled = jnp.where(jnp.isfinite(inc_scaled), inc_scaled, 0.0)

        T_new = lie.se3_exp(inc_scaled[:6]) @ s["T"]
        aff_new = s["aff"] + inc_scaled[6:8]
        # ONE warp pass per iteration: the candidate's buffers serve both
        # the accept test and (if accepted) the next iteration's H, b —
        # the reference recomputes calcRes+calcGSSSE only on accept
        # (CoarseTracker.cc:150-183); fusing them halves the gather passes,
        # at the cost of one wasted 8x8 matmul pair on rejected steps.
        bufs_n, stats_new = _calc_res(ref, pyr_new, lvl, T_new, aff_new,
                                      new_exposure, cutoff, calib, cfg,
                                      compute_flow=flow_here, packed=packed)
        Hn, bn, _ = _calc_gs(bufs_n, lvl, ref, aff_new, new_exposure, calib)
        accept = (stats_new[0] / jnp.maximum(stats_new[1], 1.0)
                  < s["stats"][0] / jnp.maximum(s["stats"][1], 1.0))

        acc = {**s, "T": T_new, "aff": aff_new, "H": Hn, "b": bn,
               "stats": stats_new, "lam": s["lam"] * 0.5}
        rej = {**s, "lam": jnp.maximum(s["lam"] * 4.0,
                                       _LAMBDA_EXTRAPOLATION_LIMIT)}
        s = jax.tree_util.tree_map(
            lambda a, r: jnp.where(accept, a, r), acc, rej)
        s["done"] = jnp.linalg.norm(inc) <= 1e-3
        s["it"] = s["it"] + 1
        return s

    lm0 = dict(T=T, aff=aff, H=H0, b=b0, stats=stats0,
               lam=jnp.float32(0.01), it=jnp.int32(0),
               done=jnp.asarray(False))
    lm = jax.lax.while_loop(lm_cond, lm_body, lm0)

    # zero surviving terms => inf, not 0: the reference's sqrt(E/n) is NaN
    # at n == 0 and fails its isfinite gate (FullSystem.cc:117-123); the
    # max(n,1) guard here silently turned total-overlap-loss into a
    # PERFECT score, which then poisoned the pipelined retrack gate's
    # lastRes (res0 < 0 is unsatisfiable -> every later frame trips)
    rms = jnp.where(lm["stats"][1] > 0,
                    jnp.sqrt(lm["stats"][0] / jnp.maximum(lm["stats"][1], 1.0)),
                    jnp.inf)
    last_res = last_res.at[lvl].set(rms)
    flow = lm["stats"][2:5]
    ok_flag = ok_flag & (rms <= 1.5 * min_res_abort[lvl])
    return (lm["T"], lm["aff"], ok_flag, last_res, flow), (cutoff_rep > 1.0)


@functools.partial(jax.jit, static_argnames=("calib", "cfg", "coarsest"))
def track_frame(ref: TrackerRef, pyr_new: FramePyramid, T_init, aff_init,
                new_exposure, min_res_abort, calib: Calibration, cfg: Config,
                coarsest: int):
    """Full coarse-to-fine direct alignment; one device program.

    Returns (T, aff, ok, last_residuals(6,), flow(3,)).
    T maps ref-KF camera to new camera (refToNew)."""
    T = jnp.asarray(T_init, jnp.float32)
    aff = jnp.asarray(aff_init, jnp.float32)
    nlv = calib.levels
    state = (T, aff, jnp.asarray(True),
             jnp.full((nlv,), jnp.nan, jnp.float32),
             jnp.full((3,), 1000.0, jnp.float32))
    have_repeated = jnp.asarray(False)

    for lvl in range(min(coarsest, nlv - 1), -1, -1):
        max_it = cfg.coarse_lm_iterations[lvl]
        # one packed-tap image per level, built once and amortized over
        # every LM iteration's warp pass (4x fewer gather indices)
        packed = (pack_taps(pyr_new.dI[lvl])
                  if cfg.tracker_packed_taps else None)

        def run(st, lvl=lvl, max_it=max_it, packed=packed):
            return _level_block(ref, pyr_new, lvl, st, new_exposure,
                                min_res_abort, calib, cfg, max_it,
                                packed=packed)

        def run_if_ok(st):
            new_st, repeat = jax.lax.cond(
                st[2], run, lambda s: (s, jnp.asarray(False)), st)
            return new_st, repeat

        state, repeat = run_if_ok(state)
        # repeat the level once if the cutoff had to be raised
        # (CoarseTracker.cc:192-195)
        do_repeat = repeat & ~have_repeated
        state = jax.lax.cond(do_repeat & state[2],
                             lambda st: run(st)[0], lambda st: st, state)
        have_repeated = have_repeated | repeat

    T, aff, ok, last_res, flow = state

    # final affine sanity gates (CoarseTracker.cc:203-214)
    if cfg.affine_opt_mode_a != 0:
        ok = ok & (jnp.abs(aff[0]) <= 1.2)
    if cfg.affine_opt_mode_b != 0:
        ok = ok & (jnp.abs(aff[1]) <= 200.0)
    rel = affine.from_to(ref.ref_exposure, new_exposure, ref.ref_aff, aff)
    if cfg.affine_opt_mode_a == 0:
        ok = ok & (jnp.abs(jnp.log(rel[0])) <= 1.5)
    if cfg.affine_opt_mode_b == 0:
        ok = ok & (jnp.abs(rel[1]) <= 200.0)
    if cfg.affine_opt_mode_a < 0:
        aff = aff.at[0].set(0.0)
    if cfg.affine_opt_mode_b < 0:
        aff = aff.at[1].set(0.0)
    touched = min(coarsest, calib.levels - 1) + 1
    ok = ok & jnp.all(jnp.isfinite(last_res[:touched]))
    return T, aff, ok, last_res, flow


@functools.partial(jax.jit, static_argnames=("calib", "cfg", "coarsest"))
def track_frame_packed(ref: TrackerRef, pyr_new: FramePyramid, T_init,
                       aff_init, new_exposure, min_res_abort,
                       calib: Calibration, cfg: Config, coarsest: int):
    """track_frame with all outputs packed into ONE flat array, so the host
    pays a single device->host transfer per frame (the axon tunnel charges
    per round-trip)."""
    T, aff, ok, res, flow = track_frame(ref, pyr_new, T_init, aff_init,
                                        new_exposure, min_res_abort,
                                        calib, cfg, coarsest)
    return jnp.concatenate([
        T.reshape(-1), aff, ok.astype(jnp.float32)[None], res, flow])


@functools.partial(jax.jit, static_argnames=("calib", "cfg", "coarsest"))
def track_frame_hypotheses(ref: TrackerRef, pyr_new: FramePyramid,
                           T_inits, aff_init, new_exposure, min_res_abort,
                           calib: Calibration, cfg: Config, coarsest: int):
    """Evaluate a batch of motion hypotheses in parallel (the reference's
    sequential ~27-retry loop, FullSystem.cc:189-311, batched on device).

    T_inits: (M, 4, 4). Returns per-hypothesis results; the host picks the
    best valid one."""
    fn = lambda T0: track_frame(ref, pyr_new, T0, aff_init, new_exposure,
                                min_res_abort, calib, cfg, coarsest)
    return jax.vmap(fn)(T_inits)


@functools.partial(jax.jit, static_argnames=("calib", "cfg", "coarsest"))
def rank_hypotheses(ref: TrackerRef, pyr_new: FramePyramid, T_inits,
                    aff_init, new_exposure, calib: Calibration, cfg: Config,
                    coarsest: int):
    """Initial coarsest-level mean Huber energy of each motion hypothesis
    (one warp pass, no LM).

    The reference's sequential retry loop gets this ranking implicitly: a
    bad initialization blows past achievedRes within its first coarse
    iterations and aborts (CoarseTracker.cc:114-129, FullSystem.cc:305-311).
    Under vmap those aborts are dead — lax.cond lowers to select, so every
    batched hypothesis pays the FULL pyramid LM (~22 ms each). Ranking all
    hypotheses with one cheap coarsest-level residual pass and LM-refining
    only the best few restores the reference's effective cost shape on the
    batch path. T_inits: (M, 4, 4) refToNew initializations. Returns (M,)
    mean energy; hypotheses with <10 points projecting in-bounds rank inf."""
    def one(T0):
        _, stats = _calc_res(ref, pyr_new, coarsest, T0,
                             jnp.asarray(aff_init, jnp.float32),
                             new_exposure, cfg.coarse_cutoff_th, calib, cfg,
                             compute_flow=False)
        E, num = stats[0], stats[1]
        return jnp.where(num > 10.0, E / jnp.maximum(num, 1.0), jnp.inf)
    return jax.vmap(one)(jnp.asarray(T_inits, jnp.float32))
