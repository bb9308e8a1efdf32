"""The windowed-BA LM loop as ONE device program.

The host-orchestrated loop in EnergyFunctional.optimize mirrors the
reference structure faithfully but costs ~20 host<->device round trips per
keyframe — ruinous behind a remote TPU tunnel. This module compiles the
whole FullSystem::optimize default path (setting_forceAceptStep == true,
FIX_LAMBDA | ORTHOGONALIZE_X_LATER; Setting.cc:23,77) into a single jit:

  reset -> linearize -> [solve -> step -> relinearize] x iters -> re-fix
  newest eval point -> final linearize -> commit + drop dead residuals

The <=68x68 stitched solve runs on device in float32 with diagonal
scaling, the reference's +10 damping, and one iterative-refinement pass —
validated against the host float64 path on synthetic windows
(tests/test_backend_device.py). Nullspace orthogonalization (x-later,
iteration >= 2) runs on device via SVD of the 9-column nullspace basis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ldso_tpu.config import (CPARS, Config, SCALE_A, SCALE_B, SCALE_XI_ROT,
                             SCALE_XI_TRANS)
from ldso_tpu.backend import ba
from ldso_tpu.backend.window import (RES_IN, RES_OOB, RES_OUTLIER, Window,
                                     aff_g2l_zero, current_poses)
from ldso_tpu.math import lie


def _reset_oob_dev(W: Window) -> Window:
    mask = (W.res_exist & W.pt_valid[:, None] & ~W.res_linearized
            & W.frame_valid[None, :])
    return W._replace(
        res_state=jnp.where(mask, RES_IN, W.res_state),
        res_new_state=jnp.where(mask, RES_OUTLIER, W.res_new_state),
        res_energy=jnp.where(mask, 0.0, W.res_energy),
        res_new_energy=jnp.where(mask, 0.0, W.res_new_energy),
    )


def _apply_res_dev(W: Window) -> Window:
    mask = (W.res_exist & W.pt_valid[:, None] & ~W.res_linearized
            & W.frame_valid[None, :])
    upd = mask & (W.res_state != RES_OOB)
    active = upd & (W.res_new_state == RES_IN)
    return W._replace(
        res_active=jnp.where(upd, active, W.res_active),
        res_state=jnp.where(upd, W.res_new_state, W.res_state),
        res_energy=jnp.where(upd, W.res_new_energy, W.res_energy),
    )


def _nullspaces_dev(W: Window):
    """(n, 9) nullspace basis on device (getNullspaces,
    FullSystem.cc:1711-1760); rows of invalid frames are zero."""
    F = W.F
    n = CPARS + 8 * F
    adj = lie.se3_adj(W.T_eval)                      # (F,6,6)
    aff0 = aff_g2l_zero(W)
    fv = W.frame_valid.astype(jnp.float32)

    cols = []
    inv_scale = jnp.concatenate([
        jnp.full(3, 1.0 / SCALE_XI_TRANS), jnp.full(3, 1.0 / SCALE_XI_ROT)])
    for i in range(6):
        seg = adj[:, :, i] * inv_scale[None, :] * fv[:, None]   # (F,6)
        col = jnp.zeros(n, jnp.float32)
        col = col.at[CPARS:].set(
            jnp.concatenate([seg, jnp.zeros((F, 2), jnp.float32)], axis=1).reshape(-1))
        cols.append(col)
    colA = jnp.zeros(n, jnp.float32)
    affA = jnp.zeros((F, 8), jnp.float32).at[:, 6].set(1.0 / SCALE_A) * fv[:, None]
    colA = colA.at[CPARS:].set(affA.reshape(-1))
    colB = jnp.zeros(n, jnp.float32)
    affB = jnp.zeros((F, 8), jnp.float32).at[:, 7].set(
        jnp.exp(aff0[:, 0]) * W.exposure / SCALE_B) * fv[:, None]
    colB = colB.at[CPARS:].set(affB.reshape(-1))
    cols += [colA, colB]
    t_ev = W.T_eval[:, :3, 3] / SCALE_XI_TRANS * fv[:, None]
    colS = jnp.zeros(n, jnp.float32)
    colS = colS.at[CPARS:].set(
        jnp.concatenate([t_ev, jnp.zeros((F, 5), jnp.float32)], axis=1).reshape(-1))
    cols.append(colS)
    return jnp.stack(cols, axis=1)


def _orthogonalize_dev(x, N, delta: float):
    """x -= N (N^T N)^+ N^T x (EnergyFunctional::orthogonalize)."""
    Nn = N / jnp.maximum(jnp.linalg.norm(N, axis=0, keepdims=True), 1e-12)
    U, S, Vt = jnp.linalg.svd(Nn, full_matrices=False)
    Sinv = jnp.where(S > delta * jnp.max(S), 1.0 / jnp.maximum(S, 1e-20), 0.0)
    Npi = (U * Sinv[None, :]) @ Vt
    NNpiT = Nn @ Npi.T
    NNpiTS = 0.5 * (NNpiT + NNpiT.T)
    return x - NNpiTS @ x


def _solve_dev(W: Window, HM, bM, lam, do_orth, cfg: Config):
    """Stitched assembly + scaled f32 solve + resubstitution pieces."""
    HA, bA, HL, bL, Hsc, bsc, aux, delta, nresA = ba.build_system(W)
    n = HA.shape[0]

    bM_top = bM + HM @ delta
    HFinal = HL + HM + HA
    bFinal = bL + bM_top + bA - bsc
    diag = jnp.diag(HFinal) * (1.0 + lam)
    HFinal = HFinal.at[jnp.arange(n), jnp.arange(n)].set(diag)
    HFinal = HFinal - Hsc * (1.0 / (1.0 + lam))

    # invalid frame slots: identity rows/cols so the solve stays regular
    fmask = jnp.concatenate([
        jnp.ones(CPARS, jnp.float32),
        jnp.repeat(W.frame_valid.astype(jnp.float32), 8)])
    HFinal = HFinal * fmask[:, None] * fmask[None, :]
    HFinal = HFinal + jnp.diag(jnp.where(fmask > 0, 0.0, 1.0))
    bFinal = bFinal * fmask

    SVecI = 1.0 / jnp.sqrt(jnp.abs(jnp.diag(HFinal)) + 10.0)
    Hs = SVecI[:, None] * HFinal * SVecI[None, :]
    bs = SVecI * bFinal
    xs = jnp.linalg.solve(Hs, bs)
    # one iterative-refinement pass recovers f64-grade accuracy in f32
    r = bs - Hs @ xs
    xs = xs + jnp.linalg.solve(Hs, r)
    x = SVecI * xs

    # pose + scale columns only (the reference's orthogonalize() inserts
    # lastNullspaces_pose and _scale, not affine: EnergyFunctional.cc:687-689)
    N = _nullspaces_dev(W)[:, jnp.array([0, 1, 2, 3, 4, 5, 8])]
    x_orth = _orthogonalize_dev(x, N, cfg.solver_mode_delta)
    x = jnp.where(do_orth, x_orth, x)
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    return x, aux, nresA


@functools.partial(jax.jit, static_argnames=("cfg", "img_w", "img_h",
                                             "max_iterations"))
def optimize_device(W: Window, dIs: jax.Array, HM: jax.Array, bM: jax.Array,
                    newest: jax.Array, cfg: Config, img_w: int, img_h: int,
                    max_iterations: int):
    """One device program for the whole default-mode LM loop.

    Returns (W, stats) with stats = [final energy, nresA, rmse,
    idepth-hessian refreshed in W.pt_idepth_hessian]."""
    from ldso_tpu.config import SOLVER_FIX_LAMBDA, SOLVER_USE_GN
    lam0 = 1e-5 if (cfg.solver_mode & SOLVER_FIX_LAMBDA) else (
        0.0 if (cfg.solver_mode & SOLVER_USE_GN) else 1e-1)

    W = _reset_oob_dev(W)
    W, eP = ba.linearize_all(W, dIs, cfg, img_w, img_h)
    W = ba.set_new_frame_energy_th(W, newest, cfg)
    W = _apply_res_dev(W)

    def cond(s):
        return (~s["done"]) & (s["it"] < max_iterations)

    def body(s):
        W = ba.backup_state(s["W"])
        do_orth = s["it"] >= 2   # ORTHOGONALIZE_X_LATER
        x, aux, nresA = _solve_dev(W, HM, bM, jnp.float32(lam0), do_orth, cfg)
        W = ba.resubstitute(W, x, aux["HdiF"], aux["bdSum"], aux["Hcd"],
                            aux["JpJdF"])
        W = W._replace(pt_idepth_hessian=1.0 / jnp.maximum(aux["HdiF"], 1e-12))
        W, canbreak = ba.do_step(W, 1.0, 1.0, 1.0, 1.0, 1.0)
        W, eP = ba.linearize_all(W, dIs, cfg, img_w, img_h)
        W = ba.set_new_frame_energy_th(W, newest, cfg)
        W = _apply_res_dev(W)   # force-accept path
        done = canbreak & (s["it"] + 1 >= cfg.min_opt_iterations)
        return dict(W=W, it=s["it"] + 1, done=done, eP=eP,
                    nresA=nresA.astype(jnp.int32))

    s0 = dict(W=W, it=jnp.int32(0), done=jnp.asarray(False),
              eP=eP, nresA=jnp.int32(1))
    s = jax.lax.while_loop(cond, body, s0)
    W = s["W"]

    # re-fix the newest frame's evaluation point keeping (a, b)
    T_cur = current_poses(W)
    new_zero = jnp.zeros(10, jnp.float32).at[6:8].set(
        W.state[newest, 6:8])
    W = W._replace(
        T_eval=W.T_eval.at[newest].set(T_cur[newest]),
        state=W.state.at[newest].set(new_zero),
        state_zero=W.state_zero.at[newest].set(new_zero),
    )

    if cfg.ba_finalize_sliced:
        # only the newest-target column changed (the eval-point re-fix
        # touches no other pair); sticky OOB like the reference's final
        # linearizeAll(true) — see ba.linearize_target
        W, eP = ba.linearize_target(W, dIs, cfg, img_w, img_h, newest)
    else:
        W = _reset_oob_dev(W)
        W, eP = ba.linearize_all(W, dIs, cfg, img_w, img_h)
    W = ba.set_new_frame_energy_th(W, newest, cfg)

    # finalize: commit + per-point stats + drop dead residuals
    mask = (W.res_exist & W.pt_valid[:, None] & ~W.res_linearized
            & W.frame_valid[None, :])
    upd = mask & (W.res_state != RES_OOB)
    active = upd & (W.res_new_state == RES_IN)
    W = W._replace(
        res_active=jnp.where(upd, active, W.res_active),
        res_state=jnp.where(upd, W.res_new_state, W.res_state),
        res_energy=jnp.where(upd, W.res_new_energy, W.res_energy),
    )
    pc = ba.make_precalc(W)
    KRKi = pc.KRKi[W.pt_host]
    Kt = pc.Kt[W.pt_host]
    p1 = jnp.stack([W.pt_u, W.pt_v, jnp.ones_like(W.pt_u)], -1)
    ptp_inf = jnp.einsum("pfij,pj->pfi", KRKi, p1)
    ptp = ptp_inf + Kt * W.idepth[:, None, None]
    pi = ptp_inf[..., :2] / ptp_inf[..., 2:3]
    pp = ptp[..., :2] / ptp[..., 2:3]
    rel_bs = 0.01 * jnp.linalg.norm(pi - pp, axis=-1)
    act_now = W.res_active & mask
    W = W._replace(
        pt_max_rel_baseline=jnp.maximum(
            W.pt_max_rel_baseline, jnp.max(jnp.where(act_now, rel_bs, 0.0), axis=1)),
        pt_num_good_res=W.pt_num_good_res + jnp.sum(act_now, axis=1),
        res_exist=W.res_exist & ~(mask & ~W.res_active),
    )
    rmse = jnp.sqrt(eP / jnp.maximum(8.0 * s["nresA"].astype(jnp.float32), 1.0))
    stats = jnp.stack([eP, s["nresA"].astype(jnp.float32), rmse])
    return W, stats
