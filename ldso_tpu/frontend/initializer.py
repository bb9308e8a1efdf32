"""Monocular bootstrap: joint (pose, affine, per-point idepth) optimization.

Rebuild of the reference CoarseInitializer (src/frontend/CoarseInitializer.cc):
  * set_first (:547-619): select candidate points at 5 densities across
    pyramid levels, build a 10-NN neighbour graph + coarser-level parent —
    the reference uses a nanoflann kd-tree; here it is a chunked brute-force
    top-k on device (point counts are a few thousand; a (Nq x N) distance
    tile is one MXU matmul).
  * track_frame (:40-177): per level coarse-to-fine LM over the 8-dof
    (pose, a, b) with each point's idepth eliminated by a per-point Schur
    complement (calcResAndGS :181-405, doStep :645-671). The whole level
    optimization runs as one jitted device program; the host only sequences
    levels and tracks the 'snapped' flag.
  * idepth regularization toward the neighbourhood median iR
    (optReg :430-459), pyramid propagation up/down (:462-547), and the
    translation-alpha prior snapping (:339-361) are ported exactly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldso_tpu.config import (Config, PATTERN, SCALE_XI_ROT, SCALE_XI_TRANS,
                             SCALE_A, SCALE_B)
from ldso_tpu.camera.calib import Calibration
from ldso_tpu.math import lie
from ldso_tpu.ops import select as select_ops
from ldso_tpu.ops.interp import bilinear
from ldso_tpu.ops.preprocess import FramePyramid

ALPHA_K = 2.5 * 2.5           # (CoarseInitializer.cc:45)
ALPHA_W = 150.0 * 150.0
REG_WEIGHT = 0.8
COUPLING_WEIGHT = 1.0
MAX_ITERATIONS = (5, 5, 10, 30, 50, 50)
NN_K = 10
NN_DIST_FACTOR = 0.05         # (CoarseInitializer.cc:722)


class InitLevel(NamedTuple):
    """Fixed-capacity point pool for one pyramid level."""
    u: jax.Array            # (cap,)
    v: jax.Array
    valid: jax.Array        # (cap,) bool — slot is a real point
    idepth: jax.Array
    idepth_new: jax.Array
    iR: jax.Array
    energy: jax.Array       # (cap, 2): [photometric, (idepth-1)^2]
    energy_new: jax.Array
    is_good: jax.Array      # (cap,) bool
    is_good_new: jax.Array
    last_hessian: jax.Array
    last_hessian_new: jax.Array
    max_step: jax.Array
    jb: jax.Array           # (cap, 10) JbBuffer
    neighbours: jax.Array   # (cap, NN_K) int32, -1 = none
    parent: jax.Array       # (cap,) int32 into level+1, -1 at top
    outlier_th: jax.Array   # (cap,)


@dataclasses.dataclass
class InitializerState:
    """Host-side wrapper (the reference's CoarseInitializer object state)."""
    levels: Tuple[InitLevel, ...]
    T: np.ndarray                 # thisToNext (4,4) f64
    aff: np.ndarray               # (2,)
    snapped: bool = False
    frame_id: int = 0
    snapped_at: int = 0


# ---------------------------------------------------------------------------
# setFirst
# ---------------------------------------------------------------------------

def _knn(u, v, valid, k: int, qu=None, qv=None, q_valid=None, chunk=1024):
    """Brute-force k-NN: returns (Nq, k) indices into (u, v). Invalid points
    are pushed to +inf distance. Also returns distances."""
    if qu is None:
        qu, qv, q_valid = u, v, valid
    n = u.shape[0]
    pts = jnp.stack([u, v], axis=-1)
    qpts = jnp.stack([qu, qv], axis=-1)
    big = jnp.float32(1e30)

    def one_chunk(q):
        d = jnp.sum((q[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        d = jnp.where(valid[None, :], d, big)
        neg_d, idx = jax.lax.top_k(-d, k)
        return idx, -neg_d

    nq = qpts.shape[0]
    pad = (-nq) % chunk
    qp = jnp.pad(qpts, ((0, pad), (0, 0)))
    chunks = qp.reshape(-1, chunk, 2)
    idxs, dists = jax.lax.map(one_chunk, chunks)
    return (idxs.reshape(-1, k)[:nq], dists.reshape(-1, k)[:nq])


@functools.partial(jax.jit, static_argnames=("k",))
def _make_nn_level(u, v, valid, k: int):
    idx, dist = _knn(u, v, valid, k)
    nb = jnp.where(valid[:, None], idx, -1)
    return nb, dist


@functools.partial(jax.jit, static_argnames=())
def _make_parent(u, v, valid, pu, pv, pvalid):
    qx = u * 0.5 - 0.25
    qy = v * 0.5 - 0.25
    idx, dist = _knn(pu, pv, pvalid, 1, qx, qy, valid)
    return jnp.where(valid, idx[:, 0], -1)


def _round_cap(n: int) -> int:
    return max(256, int(2 ** np.ceil(np.log2(max(n, 1)))))


def set_first(pyr: FramePyramid, calib: Calibration, cfg: Config,
              selector: Optional[select_ops.PixelSelector] = None) -> InitializerState:
    """Select candidate points on the first frame and build the NN graph
    (reference setFirst, CoarseInitializer.cc:547-619)."""
    densities = [0.03, 0.05, 0.15, 0.5, 1.0, 1.0]
    w0h0 = calib.w[0] * calib.h[0]
    if selector is None:
        selector = select_ops.PixelSelector(calib.w[0], calib.h[0], cfg)

    levels = []
    pad = 2 + 1  # patternPadding + 1
    for lvl in range(calib.levels):
        wl, hl = calib.w[lvl], calib.h[lvl]
        if lvl == 0:
            selector.current_potential = 3
            status, _ = selector.make_maps(pyr, densities[0] * w0h0, th_factor=2.0)
            mask = np.asarray(status) != 0
        else:
            bmap, _, _ = select_ops.make_pixel_status(
                pyr.dI[lvl], densities[lvl] * w0h0)
            mask = np.asarray(bmap)
        ys, xs = np.mgrid[0:hl, 0:wl]
        inb = (xs >= pad) & (xs < wl - pad - 1) & (ys >= pad) & (ys < hl - pad - 1)
        mask = mask & inb
        py, px = np.nonzero(mask)
        n = len(px)
        cap = _round_cap(n)

        def padf(a, fill=0.0):
            return jnp.asarray(np.concatenate(
                [a.astype(np.float32), np.full(cap - n, fill, np.float32)]))

        u = padf(px + 0.1)
        v = padf(py + 0.1)
        valid = jnp.asarray(np.arange(cap) < n)
        ones = jnp.ones(cap, jnp.float32)
        levels.append(InitLevel(
            u=u, v=v, valid=valid,
            idepth=ones, idepth_new=ones, iR=ones,
            energy=jnp.zeros((cap, 2), jnp.float32),
            energy_new=jnp.zeros((cap, 2), jnp.float32),
            is_good=valid, is_good_new=valid,
            last_hessian=jnp.zeros(cap, jnp.float32),
            last_hessian_new=jnp.zeros(cap, jnp.float32),
            max_step=jnp.full(cap, 1e10, jnp.float32),
            jb=jnp.zeros((cap, 10), jnp.float32),
            neighbours=jnp.full((cap, NN_K), -1, jnp.int32),
            parent=jnp.full(cap, -1, jnp.int32),
            outlier_th=jnp.full(cap, 8.0 * cfg.outlier_th, jnp.float32),
        ))

    # NN graph + parents (reference makeNN, CoarseInitializer.cc:717-783)
    levels = list(levels)
    for lvl in range(calib.levels):
        L = levels[lvl]
        nb, _ = _make_nn_level(L.u, L.v, L.valid, NN_K)
        parent = (
            _make_parent(L.u, L.v, L.valid,
                         levels[lvl + 1].u, levels[lvl + 1].v,
                         levels[lvl + 1].valid)
            if lvl < calib.levels - 1 else jnp.full(L.u.shape[0], -1, jnp.int32))
        levels[lvl] = L._replace(neighbours=nb, parent=parent)

    return InitializerState(levels=tuple(levels), T=np.eye(4), aff=np.zeros(2))


# ---------------------------------------------------------------------------
# per-level residual/Jacobian/Schur (calcResAndGS)
# ---------------------------------------------------------------------------

def _calc_res_gs(L: InitLevel, dI_ref, dI_new, T, aff_rel, lvl,
                 calib: Calibration, cfg: Config, snapped):
    """Returns (H(8,8), b(8,), Hsc, bsc, res(3,), point updates dict)."""
    wl, hl = calib.w[lvl], calib.h[lvl]
    fx, fy = calib.fx[lvl], calib.fy[lvl]
    cx, cy = calib.cx[lvl], calib.cy[lvl]
    Ki = jnp.asarray(calib.Ki(lvl), jnp.float32)
    R = T[:3, :3]
    t = T[:3, 3]
    RKi = (R @ Ki).astype(jnp.float32)
    a_rel = jnp.exp(aff_rel[0])
    b_rel = aff_rel[1]

    patt = jnp.asarray(PATTERN, jnp.float32)      # (8, 2)
    uP = L.u[:, None] + patt[None, :, 0]          # (N, 8)
    vP = L.v[:, None] + patt[None, :, 1]
    idep = L.idepth_new[:, None]

    ones = jnp.ones_like(uP)
    p = jnp.stack([uP, vP, ones], axis=-1)        # (N,8,3)
    pt = jnp.einsum("ij,npj->npi", RKi, p) + t[None, None, :] * idep[..., None]
    u = pt[..., 0] / pt[..., 2]
    v = pt[..., 1] / pt[..., 2]
    Ku = fx * u + cx
    Kv = fy * v + cy
    new_idepth = idep / pt[..., 2]

    inb = (Ku > 1) & (Kv > 1) & (Ku < wl - 2) & (Kv < hl - 2) & (new_idepth > 0)

    hit = bilinear(dI_new, Ku, Kv)                # (N,8,3)
    ref_c = bilinear(dI_ref[..., 0], uP, vP)      # (N,8) intensity only
    finite = jnp.isfinite(hit[..., 0]) & jnp.isfinite(ref_c)
    ok_pix = inb & finite
    point_ok = L.is_good & L.valid & jnp.all(ok_pix, axis=-1)

    residual = hit[..., 0] - a_rel * ref_c - b_rel
    abs_r = jnp.abs(residual)
    hw_e = jnp.where(abs_r < cfg.huber_th, 1.0,
                     cfg.huber_th / jnp.maximum(abs_r, 1e-12))
    energy = jnp.sum(hw_e * residual * residual * (2.0 - hw_e), axis=-1)

    good_new = point_ok & (energy <= L.outlier_th * 20.0)

    # Jacobians with sqrt-Huber folded in (CoarseInitializer.cc:268-291)
    hw = jnp.where(hw_e < 1.0, jnp.sqrt(hw_e), hw_e)
    dxdd = (t[0] - t[2] * u) / pt[..., 2]
    dydd = (t[1] - t[2] * v) / pt[..., 2]
    dxI = hw * hit[..., 1] * fx
    dyI = hw * hit[..., 2] * fy
    dp = jnp.stack([
        new_idepth * dxI,
        new_idepth * dyI,
        -new_idepth * (u * dxI + v * dyI),
        -u * v * dxI - (1.0 + v * v) * dyI,
        (1.0 + u * u) * dxI + u * v * dyI,
        -v * dxI + u * dyI,
        -hw * a_rel * ref_c,
        -hw,
    ], axis=-1)                                   # (N,8,8)
    dd = dxI * dxdd + dyI * dydd                  # (N,8)
    r = hw * residual

    step_norm = jnp.sqrt((dxdd * fx) ** 2 + (dydd * fy) ** 2)
    max_step = jnp.min(jnp.where(ok_pix, 1.0 / jnp.maximum(step_norm, 1e-12),
                                 1e10), axis=-1)
    max_step = jnp.where(good_new, max_step, 1e10)

    # 9x9 accumulation over all (point, pattern) rows — one MXU matmul
    gmask = good_new[:, None].astype(jnp.float32)
    rows = jnp.concatenate([dp, r[..., None]], axis=-1) * gmask[..., None]
    rows = rows.reshape(-1, 9)
    H9 = rows.T @ rows
    H = H9[:8, :8]
    b = H9[:8, 8]

    # per-point Schur pieces (JbBuffer)
    jb = jnp.concatenate([
        jnp.sum(dp * dd[..., None], axis=1),      # (N,8)
        jnp.sum(r * dd, axis=1, keepdims=True),   # (N,1)
        jnp.sum(dd * dd, axis=1, keepdims=True),  # (N,1)
    ], axis=-1)
    jb = jnp.where(good_new[:, None], jb, 0.0)

    # energies: photometric + the (idepth-1)^2 leak (CoarseInitializer.cc:341-353)
    npts = jnp.sum(L.valid.astype(jnp.float32))
    e_photo = jnp.sum(jnp.where(good_new, energy,
                                jnp.where(L.valid, L.energy[:, 0], 0.0)))
    e_alpha_term = jnp.where(good_new, (L.idepth_new - 1.0) ** 2,
                             jnp.where(L.valid, L.energy[:, 1], 0.0))
    E_total = e_photo + jnp.sum(e_alpha_term)
    num_in_E = jnp.sum((good_new | L.valid).astype(jnp.float32))

    alpha_energy_raw = ALPHA_W * jnp.sum(t * t) * npts
    capped = alpha_energy_raw > ALPHA_K * npts
    alpha_energy = jnp.where(capped, ALPHA_K * npts, alpha_energy_raw)
    alpha_opt = jnp.where(capped, 0.0, ALPHA_W)

    # alpha / coupling terms into the Schur pieces (CoarseInitializer.cc:366-380)
    jb8 = jb[:, 8] + alpha_opt * (L.idepth_new - 1.0)
    jb9 = jb[:, 9] + alpha_opt
    jb8 = jb8 + jnp.where(alpha_opt == 0.0,
                          COUPLING_WEIGHT * (L.idepth_new - L.iR), 0.0)
    jb9 = jb9 + jnp.where(alpha_opt == 0.0, COUPLING_WEIGHT, 0.0)
    jb9 = 1.0 / (1.0 + jb9)
    jb = jb.at[:, 8].set(jb8).at[:, 9].set(jb9)
    jb = jnp.where(good_new[:, None], jb, 0.0)

    w_sc = jb[:, 9] * good_new.astype(jnp.float32)
    Jsc = jb[:, :8]
    Hsc = (Jsc * w_sc[:, None]).T @ Jsc
    bsc = (Jsc * w_sc[:, None]).T @ jb[:, 8]

    # alpha prior on translation (CoarseInitializer.cc:391-398)
    diag_add = alpha_opt * npts
    H = H.at[jnp.arange(3), jnp.arange(3)].add(diag_add)
    tlog = lie.se3_log(T)[:3]
    b = b.at[:3].add(tlog * alpha_opt * npts)

    updates = dict(
        is_good_new=good_new,
        energy_new=jnp.stack([jnp.where(good_new, energy, L.energy[:, 0]),
                              jnp.where(good_new, (L.idepth_new - 1.0) ** 2,
                                        L.energy[:, 1])], axis=-1),
        last_hessian_new=jnp.where(good_new, jnp.sum(dd * dd, axis=1), 0.0),
        max_step=max_step,
        jb=jb,
    )
    res = jnp.stack([E_total, alpha_energy, num_in_E])
    return H, b, Hsc, bsc, res, updates


def _calc_ec(L: InitLevel, snapped):
    """Coupling energy (calcEC, CoarseInitializer.cc:412-428)."""
    g = L.is_good_new & L.valid
    r_old = jnp.where(g, (L.idepth - L.iR) ** 2, 0.0)
    r_new = jnp.where(g, (L.idepth_new - L.iR) ** 2, 0.0)
    E = jnp.stack([COUPLING_WEIGHT * jnp.sum(r_old),
                   COUPLING_WEIGHT * jnp.sum(r_new)])
    return jnp.where(snapped, E, jnp.zeros(2, E.dtype))


def _opt_reg(L: InitLevel, snapped) -> InitLevel:
    """Pull iR toward the neighbourhood median (optReg, :430-459)."""
    nb = L.neighbours
    nb_ok = (nb >= 0) & jnp.take(L.is_good & L.valid, jnp.maximum(nb, 0))
    nb_iR = jnp.take(L.iR, jnp.maximum(nb, 0))
    vals = jnp.where(nb_ok, nb_iR, jnp.inf)
    vals = jnp.sort(vals, axis=-1)
    nnn = jnp.sum(nb_ok, axis=-1)
    med = jnp.take_along_axis(vals, jnp.maximum(nnn[:, None] // 2, 0),
                              axis=-1)[:, 0]
    use = (nnn > 2) & L.is_good & L.valid
    iR_new = jnp.where(use, (1.0 - REG_WEIGHT) * L.idepth + REG_WEIGHT * med,
                       L.iR)
    iR_new = jnp.where(snapped, iR_new, jnp.ones_like(iR_new))
    return L._replace(iR=iR_new)


def _reset_points(L: InitLevel, is_top: bool) -> InitLevel:
    """resetPoints (:621-643): zero energies; at the top level revive bad
    points from the mean of good neighbours."""
    L = L._replace(energy=jnp.zeros_like(L.energy), idepth_new=L.idepth)
    if not is_top:
        return L
    nb = L.neighbours
    nb_ok = (nb >= 0) & jnp.take(L.is_good & L.valid, jnp.maximum(nb, 0))
    nb_iR = jnp.take(L.iR, jnp.maximum(nb, 0))
    s = jnp.sum(jnp.where(nb_ok, nb_iR, 0.0), axis=-1)
    n = jnp.sum(nb_ok, axis=-1)
    revive = (~L.is_good) & L.valid & (n > 0)
    mean = s / jnp.maximum(n, 1)
    return L._replace(
        is_good=L.is_good | revive,
        iR=jnp.where(revive, mean, L.iR),
        idepth=jnp.where(revive, mean, L.idepth),
        idepth_new=jnp.where(revive, mean, L.idepth_new),
    )


def _do_step(L: InitLevel, inc, lam) -> InitLevel:
    """Per-point idepth resubstitution (doStep, :645-671)."""
    b = L.jb[:, 8] + L.jb[:, :8] @ inc
    step = -b * L.jb[:, 9] / (1.0 + lam)
    max_step = jnp.minimum(0.25 * L.max_step, 1e10)
    step = jnp.clip(step, -max_step, max_step)
    new_id = jnp.clip(L.idepth + step, 1e-3, 50.0)
    new_id = jnp.where(L.is_good & L.valid, new_id, L.idepth_new)
    return L._replace(idepth_new=new_id)


def _apply_step(L: InitLevel) -> InitLevel:
    """Commit (applyStep, :673-687)."""
    good = L.is_good & L.valid
    return L._replace(
        idepth=jnp.where(good, L.idepth_new, L.iR),
        idepth_new=jnp.where(good, L.idepth_new, L.iR),
        energy=jnp.where(good[:, None], L.energy_new, L.energy),
        is_good=jnp.where(L.valid, L.is_good_new, L.is_good),
        last_hessian=jnp.where(good, L.last_hessian_new, L.last_hessian),
    )


# ---------------------------------------------------------------------------
# one-level LM optimization (jitted)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("lvl", "calib", "cfg", "fix_affine"))
def _level_opt(L: InitLevel, dI_ref, dI_new, T0, aff0, snapped,
               lvl: int, calib: Calibration, cfg: Config,
               fix_affine: bool = True):
    """The per-level LM loop of trackFrame (CoarseInitializer.cc:74-165)."""
    wl, hl = calib.w[lvl], calib.h[lvl]
    scale = jnp.array([SCALE_XI_ROT] * 3 + [SCALE_XI_TRANS] * 3
                      + [SCALE_A, SCALE_B], jnp.float32)
    norm_fac = jnp.float32(0.01 / (wl * hl))

    H, b, Hsc, bsc, res_old, upd = _calc_res_gs(
        L, dI_ref, dI_new, T0, aff0, lvl, calib, cfg, snapped)
    L = L._replace(**upd)
    L = _apply_step(L)

    def solve(H, b, Hsc, bsc, lam):
        Hl = H + jnp.diag(jnp.diag(H)) * lam
        Hl = Hl - Hsc * (1.0 / (1.0 + lam))
        bl = b - bsc * (1.0 / (1.0 + lam))
        Hl = (scale[:, None] * Hl * scale[None, :]) * norm_fac
        bl = (scale * bl) * norm_fac
        if fix_affine:
            inc6 = -(scale[:6] * jnp.linalg.solve(
                Hl[:6, :6] + jnp.eye(6, dtype=Hl.dtype) * 1e-12, bl[:6]))
            inc = jnp.concatenate([inc6, jnp.zeros(2, Hl.dtype)])
        else:
            inc = -(scale * jnp.linalg.solve(
                Hl + jnp.eye(8, dtype=Hl.dtype) * 1e-12, bl))
        return jnp.where(jnp.isfinite(inc), inc, 0.0)

    def cond(s):
        return (~s["quit"])

    def body(s):
        inc = solve(s["H"], s["b"], s["Hsc"], s["bsc"], s["lam"])
        T_new = lie.se3_exp(inc[:6]) @ s["T"]
        aff_new = s["aff"] + inc[6:8]
        Ld = _do_step(s["L"], inc, s["lam"])
        Hn, bn, Hscn, bscn, res_new, updn = _calc_res_gs(
            Ld, dI_ref, dI_new, T_new, aff_new, lvl, calib, cfg, snapped)
        Ld = Ld._replace(**updn)
        reg = _calc_ec(Ld, snapped)

        e_new = res_new[0] + res_new[1] + reg[1]
        e_old = s["res"][0] + s["res"][1] + reg[0]
        accept = e_old > e_new

        npts = jnp.sum(Ld.valid.astype(jnp.float32))
        snap_hit = res_new[1] >= ALPHA_K * npts - 1e-3

        def on_accept(s):
            La = _apply_step(Ld)
            La = _opt_reg(La, s["snapped"] | snap_hit)
            return {**s, "L": La, "T": T_new, "aff": aff_new, "H": Hn,
                    "b": bn, "Hsc": Hscn, "bsc": bscn, "res": res_new,
                    "lam": jnp.maximum(s["lam"] * 0.5, 1e-4),
                    "fails": jnp.int32(0),
                    "snapped": s["snapped"] | snap_hit}

        def on_reject(s):
            return {**s, "lam": jnp.minimum(s["lam"] * 4.0, 1e4),
                    "fails": s["fails"] + 1}

        s = jax.lax.cond(accept, on_accept, on_reject, s)
        s["it"] = s["it"] + 1
        s["quit"] = ((jnp.linalg.norm(inc) <= 1e-4) | (s["it"] > MAX_ITERATIONS[lvl])
                     | (s["fails"] >= 2))
        return s

    state0 = dict(L=L, T=T0, aff=aff0, H=H, b=b, Hsc=Hsc, bsc=bsc,
                  res=res_old, lam=jnp.float32(0.1), fails=jnp.int32(0),
                  it=jnp.int32(0), quit=jnp.asarray(False), snapped=snapped)
    out = jax.lax.while_loop(cond, body, state0)
    return out["L"], out["T"], out["aff"], out["snapped"], out["res"]


# ---------------------------------------------------------------------------
# pyramid propagation (jitted)
# ---------------------------------------------------------------------------

@jax.jit
def _propagate_down(Lc: InitLevel, Lf: InitLevel, snapped):
    """Parent (coarse) -> child (fine) idepth blending (propagateDown,
    :519-544). Lc = level lvl (source/coarse), Lf = level lvl-1 (target)."""
    par = jnp.maximum(Lf.parent, 0)
    p_good = jnp.take(Lc.is_good & Lc.valid, par) & (Lf.parent >= 0)
    p_lh = jnp.take(Lc.last_hessian, par)
    p_iR = jnp.take(Lc.iR, par)
    usable = p_good & (p_lh >= 0.1)

    revive = usable & (~Lf.is_good) & Lf.valid
    blend_num = Lf.iR * Lf.last_hessian * 2.0 + p_iR * p_lh
    blend_den = Lf.last_hessian * 2.0 + p_lh
    blended = blend_num / jnp.maximum(blend_den, 1e-12)
    update = usable & Lf.is_good & Lf.valid

    new_iR = jnp.where(revive, p_iR, jnp.where(update, blended, Lf.iR))
    new_id = jnp.where(revive | update, new_iR, Lf.idepth)
    Lf = Lf._replace(
        iR=new_iR, idepth=new_id, idepth_new=new_id,
        is_good=Lf.is_good | revive,
        last_hessian=jnp.where(revive, 0.0, Lf.last_hessian))
    return _opt_reg(Lf, snapped)


@jax.jit
def _propagate_up(Lf: InitLevel, Lc: InitLevel, snapped):
    """Child (fine) -> parent (coarse) weighted mean (propagateUp, :462-517)."""
    good = Lf.is_good & Lf.valid & (Lf.parent >= 0)
    par = jnp.maximum(Lf.parent, 0)
    w = jnp.where(good, Lf.last_hessian, 0.0)
    num = jnp.zeros_like(Lc.iR).at[par].add(w * Lf.iR)
    den = jnp.zeros_like(Lc.iR).at[par].add(w)
    has = den > 0
    mean = num / jnp.maximum(den, 1e-12)
    Lc = Lc._replace(
        iR=jnp.where(has, mean, Lc.iR),
        idepth=jnp.where(has, mean, Lc.idepth),
        idepth_new=jnp.where(has, mean, Lc.idepth_new),
        is_good=Lc.is_good | (has & Lc.valid))
    return _opt_reg(Lc, snapped)


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

def track_frame(state: InitializerState, pyr_first: FramePyramid,
                pyr_new: FramePyramid, calib: Calibration, cfg: Config,
                first_exposure: float = 1.0, new_exposure: float = 1.0):
    """One initializer step on a new frame. Mutates `state`; returns True
    once snapped for > 5 frames (reference trackFrame, :40-177)."""
    levels = list(state.levels)
    T = jnp.asarray(state.T, jnp.float32)
    if not state.snapped:
        # restart from unit idepth with zero translation (trackFrame :51-61)
        T = T.at[:3, 3].set(0.0)
        for i, L in enumerate(levels):
            levels[i] = L._replace(iR=jnp.ones_like(L.iR),
                                   idepth_new=jnp.ones_like(L.idepth_new),
                                   last_hessian=jnp.zeros_like(L.last_hessian))
    aff = jnp.asarray(state.aff, jnp.float32)
    if first_exposure > 0 and new_exposure > 0:
        aff = jnp.array([np.log(new_exposure / first_exposure), 0.0], jnp.float32)
    snapped = jnp.asarray(state.snapped)

    top = calib.levels - 1
    for lvl in range(top, -1, -1):
        if lvl < top:
            levels[lvl] = _propagate_down(levels[lvl + 1], levels[lvl], snapped)
        levels[lvl] = _reset_points(levels[lvl], is_top=(lvl == top))
        levels[lvl], T, aff, snapped, res = _level_opt(
            levels[lvl], pyr_first.dI[lvl], pyr_new.dI[lvl], T, aff, snapped,
            lvl, calib, cfg, fix_affine=True)

    for lvl in range(0, top):
        levels[lvl + 1] = _propagate_up(levels[lvl], levels[lvl + 1], snapped)

    from ldso_tpu.utils.transfer import device_get
    state.levels = tuple(levels)
    state.T = device_get(T).astype(np.float64)
    state.aff = device_get(aff).astype(np.float64)
    state.snapped = bool(device_get(snapped))
    state.frame_id += 1
    if not state.snapped:
        state.snapped_at = 0
    if state.snapped and state.snapped_at == 0:
        state.snapped_at = state.frame_id
    return state.snapped and state.frame_id > state.snapped_at + 5
