"""Host-side EnergyFunctional: window bookkeeping, the LM driver, the tiny
float64 stitched solves, and marginalization.

Mirrors src/internal/OptimizationBackend/EnergyFunctional.cc plus the
optimization-driver parts of FullSystem (optimize / backupState /
doStepFromBackup / linearizeAll; FullSystem.cc:725-864, 1442-1692). The
hot per-residual work runs on device (backend/ba.py); this class owns:

  * the marginalization prior HM/bM in float64 (the reference keeps all
    stitched algebra in double; f64 does not compile on TPU, so the tiny
    (<=68x68) dense algebra lives on host numpy),
  * frame slot management (active frames always occupy slots [0, nf)),
  * nullspace computation + orthogonalization (FullSystem.cc:1711-1760,
    EnergyFunctional.cc:685-717).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldso_tpu.config import CPARS, Config, SCALE_A, SCALE_B, SCALE_XI_ROT, SCALE_XI_TRANS
from ldso_tpu.backend import ba
from ldso_tpu.backend.window import (RES_IN, RES_OOB, RES_OUTLIER, Window,
                                     aff_g2l_zero, current_poses, empty_window)
from ldso_tpu.math import lie


@jax.jit
def _reset_oob(W: Window) -> Window:
    """resetOOB for the active (non-linearized) residual set
    (FullSystem.cc:745-747, Residuals.h:63-68)."""
    mask = (W.res_exist & W.pt_valid[:, None] & ~W.res_linearized
            & W.frame_valid[None, :])
    return W._replace(
        res_state=jnp.where(mask, RES_IN, W.res_state),
        res_new_state=jnp.where(mask, RES_OUTLIER, W.res_new_state),
        res_energy=jnp.where(mask, 0.0, W.res_energy),
        res_new_energy=jnp.where(mask, 0.0, W.res_new_energy),
    )


@jax.jit
def _finalize_linearization(W: Window) -> Window:
    """applyRes(true) + drop dead residuals + per-point stats
    (linearizeAll fixLinearization path, FullSystem.cc:1466-1543)."""
    mask = (W.res_exist & W.pt_valid[:, None] & ~W.res_linearized
            & W.frame_valid[None, :])
    frozen = W.res_state == RES_OOB
    upd = mask & ~frozen
    active = upd & (W.res_new_state == RES_IN)
    W = W._replace(
        res_active=jnp.where(upd, active, W.res_active),
        res_state=jnp.where(upd, W.res_new_state, W.res_state),
        res_energy=jnp.where(upd, W.res_new_energy, W.res_energy),
    )
    # per-point stats for active residuals (maxRelBaseline / numGoodResiduals)
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
    best = jnp.max(jnp.where(act_now, rel_bs, 0.0), axis=1)
    W = W._replace(
        pt_max_rel_baseline=jnp.maximum(W.pt_max_rel_baseline, best),
        pt_num_good_res=W.pt_num_good_res + jnp.sum(act_now, axis=1),
        # drop residuals that ended up not active (FullSystem.cc:1474-1490)
        res_exist=W.res_exist & ~(mask & ~W.res_active),
    )
    return W


@jax.jit
def _insert_keyframe_dev(W: Window, dIs, i, T_cw, st, prior, exposure,
                         inherit_th, dI0):
    """Frame insertion + residual-slot creation + dI-stack update as one
    program (was 3 dispatches per keyframe: _insert_frame_dev,
    _add_residuals_dev, _set_dI)."""
    W = _insert_frame_dev(W, i, T_cw, st, prior, exposure, inherit_th)
    mask = W.pt_valid & (W.pt_host != i)
    W = W._replace(
        res_exist=W.res_exist.at[:, i].set(mask),
        res_active=W.res_active.at[:, i].set(False),
        res_linearized=W.res_linearized.at[:, i].set(False),
        res_state=W.res_state.at[:, i].set(
            jnp.where(mask, RES_IN, W.res_state[:, i])),
        res_energy=W.res_energy.at[:, i].set(0.0),
    )
    if dIs.shape[-1] == 4 * dI0.shape[-1]:
        # the window stack is stored tap-packed (ops/interp.pack_taps):
        # pack the incoming level-0 image once here, at keyframe insertion
        from ldso_tpu.ops.interp import pack_taps
        dI0 = pack_taps(dI0)
    return W, dIs.at[i].set(dI0)


@jax.jit
def _insert_frame_dev(W: Window, i, T_cw, st, prior, exposure, inherit_th):
    """All frame-insertion mutations in one dispatch."""
    th = jnp.where(inherit_th & (i > 0),
                   W.frame_energy_th[jnp.maximum(i - 1, 0)], 12.0 * 12.0 * 8.0)
    return W._replace(
        frame_valid=W.frame_valid.at[i].set(True),
        T_eval=W.T_eval.at[i].set(T_cw),
        state=W.state.at[i].set(st),
        state_zero=W.state_zero.at[i].set(st),
        exposure=W.exposure.at[i].set(exposure),
        prior=W.prior.at[i].set(prior),
        frame_energy_th=W.frame_energy_th.at[i].set(th),
    )


@jax.jit
def _insert_points_dev(W: Window, ints, floats):
    """All point-insertion mutations in one dispatch. Inputs arrive as TWO
    packed arrays (the tunnel charges per transfer): ints (kb, 3) =
    [slot, valid, host]; floats (kb, 21) = [u, v, idepth, prior, energy_th,
    color(8), weights(8)]. Padding slots are set to P and dropped by the
    scatter."""
    sl, valid, host = ints[:, 0], ints[:, 1] > 0, ints[:, 2]
    u, v, idepth, prior, energy_th = (floats[:, 0], floats[:, 1],
                                      floats[:, 2], floats[:, 3],
                                      floats[:, 4])
    color, weights = floats[:, 5:13], floats[:, 13:21]
    P = W.P
    sl = jnp.where(valid, sl, P)  # out-of-range -> dropped
    m = "drop"
    F = W.F
    res_exist_rows = (W.frame_valid[None, :]
                      & (host[:, None] != jnp.arange(F)[None, :]))
    return W._replace(
        pt_valid=W.pt_valid.at[sl].set(True, mode=m),
        pt_host=W.pt_host.at[sl].set(host, mode=m),
        pt_u=W.pt_u.at[sl].set(u, mode=m),
        pt_v=W.pt_v.at[sl].set(v, mode=m),
        pt_color=W.pt_color.at[sl].set(color, mode=m),
        pt_weights=W.pt_weights.at[sl].set(weights, mode=m),
        idepth=W.idepth.at[sl].set(idepth, mode=m),
        idepth_zero=W.idepth_zero.at[sl].set(idepth, mode=m),
        pt_prior=W.pt_prior.at[sl].set(prior, mode=m),
        pt_energy_th=W.pt_energy_th.at[sl].set(energy_th, mode=m),
        pt_num_good_res=W.pt_num_good_res.at[sl].set(0, mode=m),
        pt_max_rel_baseline=W.pt_max_rel_baseline.at[sl].set(0.0, mode=m),
        pt_idepth_hessian=W.pt_idepth_hessian.at[sl].set(0.0, mode=m),
        res_exist=W.res_exist.at[sl].set(res_exist_rows, mode=m),
        res_active=W.res_active.at[sl].set(False, mode=m),
        res_linearized=W.res_linearized.at[sl].set(False, mode=m),
        res_state=W.res_state.at[sl].set(RES_IN, mode=m),
        res_energy=W.res_energy.at[sl].set(0.0, mode=m),
    )


@jax.jit
def _add_residuals_dev(W: Window, frame_idx):
    mask = W.pt_valid & (W.pt_host != frame_idx)
    return W._replace(
        res_exist=W.res_exist.at[:, frame_idx].set(mask),
        res_active=W.res_active.at[:, frame_idx].set(False),
        res_linearized=W.res_linearized.at[:, frame_idx].set(False),
        res_state=W.res_state.at[:, frame_idx].set(
            jnp.where(mask, RES_IN, W.res_state[:, frame_idx])),
        res_energy=W.res_energy.at[:, frame_idx].set(0.0),
    )


@jax.jit
def _drop_points_dev(W: Window, pt_mask):
    return W._replace(
        pt_valid=W.pt_valid & ~pt_mask,
        res_exist=W.res_exist & ~pt_mask[:, None],
        res_active=W.res_active & ~pt_mask[:, None],
    )


@jax.jit
def _boost_prior_dev(W: Window, pt_mask, fac):
    return W._replace(pt_prior=jnp.where(pt_mask, W.pt_prior * fac, W.pt_prior))


@jax.jit
def _marg_points_dev(W: Window, pt_mask, fac):
    """Point marginalization as ONE device program: boost the idepth prior,
    mode-2 accumulate + Schur for the flagged points, drop them. Returns
    (W_after, packed) with packed = [H (n,n); b; (nres, 0...)] so the host
    pays a single transfer (marginalizePointsF, EnergyFunctional.cc:165-222
    collapsed; eager sub-calls each cost a tunnel round-trip)."""
    Wb = _boost_prior_dev(W, pt_mask, fac)
    H, b, nres = ba.accumulate_marg(Wb, pt_mask)
    n = H.shape[0]
    tail = jnp.zeros((1, n), jnp.float32).at[0, 0].set(nres.astype(jnp.float32))
    packed = jnp.concatenate([H, b[None, :], tail], axis=0)
    return _drop_points_dev(Wb, pt_mask), packed


@jax.jit
def _marg_frame_inputs(W: Window, idx):
    """[prior(8), state_delta(8)] of one frame slot in one >=64B pull."""
    return jnp.concatenate([W.prior[idx], (W.state[idx, :8] - 0.0)])


def _marg_points_fused_impl(W: Window, marg_cand, drop_in, dIs,
                            min_idepth_h, fac, cfg: Config,
                            img_w: int, img_h: int):
    """The entire end-of-keyframe point retirement as ONE device program:
    relinearize + FEJ-fix the marginalization candidates (FullSystem.cc:
    497-529), gate them on idepth-Hessian quality (flagPointsForRemoval,
    :1228-1263), mode-2 accumulate + Schur the survivors onto the (packed)
    marginalization system (marginalizePointsF, EnergyFunctional.cc:165-222)
    and drop both the survivors and the rejects. Returns
    (W', packed) where packed = [H (n,n); b; nres-row; rec^T (4,P);
    really (1,P); drop (1,P)] — one pull replaces the previous three."""
    relmask = W.res_exist & marg_cand[:, None]
    W = W._replace(
        res_linearized=W.res_linearized & ~relmask,
        res_state=jnp.where(relmask, RES_IN, W.res_state),
        res_new_state=jnp.where(relmask, RES_OUTLIER, W.res_new_state),
    )
    W, _ = ba.linearize_all(W, dIs, cfg, img_w, img_h)
    W = ba.apply_res(W)
    W = ba.fix_linearization(W, marg_cand)
    rec = jnp.stack([W.pt_u, W.pt_v, W.idepth, W.pt_idepth_hessian], axis=1)

    good_h = W.pt_idepth_hessian > min_idepth_h
    really = marg_cand & good_h
    drop = drop_in | (marg_cand & ~good_h)

    Wb = _boost_prior_dev(W, really, fac)
    H, b, nres = ba.accumulate_marg(Wb, really)
    W = _drop_points_dev(Wb, really | drop)

    n = H.shape[0]
    P = rec.shape[0]

    def row(x):  # (P,) -> (ceil(P/n), n)
        pad = (-P) % n
        return jnp.concatenate([x.astype(jnp.float32),
                                jnp.zeros(pad, jnp.float32)]).reshape(-1, n)

    tail = jnp.zeros((1, n), jnp.float32).at[0, 0].set(
        nres.astype(jnp.float32))
    packed = jnp.concatenate(
        [H, b[None, :], tail] + [row(rec[:, k]) for k in range(4)]
        + [row(really), row(drop)], axis=0)
    return W, packed


_marg_points_fused = jax.jit(
    _marg_points_fused_impl, static_argnames=("cfg", "img_w", "img_h"))


def _round_up_pow2(n: int, lo: int = 64) -> int:
    import math
    return max(lo, 1 << int(math.ceil(math.log2(max(n, 1)))))


class EnergyFunctional:
    """Owns the Window plus the host-side marginalization prior.

    Host mirrors of pt_valid / pt_host avoid device pulls on the control
    path (every pull is a full round-trip behind the remote-TPU tunnel)."""

    def __init__(self, cfg: Config, calib, F: Optional[int] = None,
                 P: Optional[int] = None):
        self.cfg = cfg
        self.calib = calib
        self.F = F if F is not None else cfg.max_frames + 1
        self.P = P if P is not None else cfg.max_points
        self.W = empty_window(self.F, self.P, calib.intrinsics_vec(), cfg)
        self.n_frames = 0
        self.HM = np.zeros((CPARS, CPARS), np.float64)
        self.bM = np.zeros(CPARS, np.float64)
        self.res_in_a = 0
        self.window_shells = []        # set by FullSystem (same list object)
        self.res_in_m = 0
        self.is_lost = False
        self.pt_valid_np = np.zeros(self.P, bool)
        self.pt_host_np = np.zeros(self.P, np.int32)

    # ------------------------------------------------------------------ frames
    def insert_frame(self, T_cw: np.ndarray, exposure: float,
                     aff: np.ndarray, is_first: bool) -> int:
        """Append a frame at slot nf (insertFrame, EnergyFunctional.cc:32-62).
        state starts at zero except (a, b) which seed state and state_zero."""
        i = self.n_frames
        assert i < self.F, "window capacity exceeded"
        W = self.W
        st = np.zeros(10, np.float32)
        st[6] = aff[0] / SCALE_A
        st[7] = aff[1] / SCALE_B
        prior = np.zeros(8, np.float32)
        if is_first:
            prior[0:3] = self.cfg.initial_trans_prior
            prior[3:6] = self.cfg.initial_rot_prior
            from ldso_tpu.config import SOLVER_REMOVE_POSEPRIOR
            if self.cfg.solver_mode & SOLVER_REMOVE_POSEPRIOR:
                prior[0:6] = 0.0      # FrameHessian::getPrior (:128-136)
            prior[6] = self.cfg.initial_aff_a_prior
            prior[7] = self.cfg.initial_aff_b_prior
        else:
            prior[6] = (self.cfg.initial_aff_a_prior
                        if self.cfg.affine_opt_mode_a < 0 else self.cfg.affine_opt_mode_a)
            prior[7] = (self.cfg.initial_aff_b_prior
                        if self.cfg.affine_opt_mode_b < 0 else self.cfg.affine_opt_mode_b)

        self.W = _insert_frame_dev(
            W, jnp.int32(i), jnp.asarray(T_cw, jnp.float32), jnp.asarray(st),
            jnp.asarray(prior), jnp.float32(exposure),
            jnp.asarray(not is_first))
        self.n_frames += 1
        # grow HM/bM with zeros for the new frame block
        n_old = self.HM.shape[0]
        n_new = n_old + 8
        HM = np.zeros((n_new, n_new), np.float64)
        HM[:n_old, :n_old] = self.HM
        bM = np.zeros(n_new, np.float64)
        bM[:n_old] = self.bM
        self.HM, self.bM = HM, bM
        return i

    def marginalize_frame(self, idx: int, pre_drop=None, prior_delta=None):
        """Schur-marginalize frame slot idx onto HM/bM and compact slots
        (EnergyFunctional::marginalizeFrame, :72-151). pre_drop: optional
        point mask to drop in the same fused device program (points hosted
        in the leaving frame). prior_delta: optional host (prior(8),
        state_delta(8)) mirrors (e.g. from the post-BA packed pull) — when
        given, the frame marginalization runs with NO device round-trip."""
        nf = self.n_frames
        odim = nf * 8 + CPARS
        ndim = odim - 8
        HM, bM = self.HM.copy(), self.bM.copy()

        if idx != nf - 1:
            # move block idx to the tail
            io = idx * 8 + CPARS
            order = (list(range(0, io)) + list(range(io + 8, odim))
                     + list(range(io, io + 8)))
            HM = HM[np.ix_(order, order)]
            bM = bM[order]

        # add the frame prior before marginalizing (:104-106); one fused
        # pull instead of two eager tiny ones (tunnel round-trips) — or zero
        # pulls when the caller already holds the mirrors
        if prior_delta is not None:
            prior = np.asarray(prior_delta[0], np.float64)
            delta_prior = np.asarray(prior_delta[1], np.float64)
        else:
            from ldso_tpu.utils.transfer import device_get
            pd = device_get(_marg_frame_inputs(
                self.W, jnp.int32(idx))).astype(np.float64)
            prior, delta_prior = pd[:8], pd[8:]
        HM[ndim:, ndim:][np.diag_indices(8)] += prior
        bM[ndim:] += prior * delta_prior

        SVec = np.sqrt(np.abs(np.diag(HM)) + 10.0)
        SVecI = 1.0 / SVec
        HMs = SVecI[:, None] * HM * SVecI[None, :]
        bMs = SVecI * bM
        hpi = np.linalg.pinv(HMs[ndim:, ndim:])
        bli = HMs[ndim:, :ndim].T @ hpi
        HMs_new = HMs[:ndim, :ndim] - bli @ HMs[ndim:, :ndim]
        bMs_new = bMs[:ndim] - bli @ bMs[ndim:]
        HM_new = SVec[:ndim, None] * HMs_new * SVec[None, :ndim]
        bM_new = SVec[:ndim] * bMs_new
        self.HM = 0.5 * (HM_new + HM_new.T)
        self.bM = bM_new

        # drop hosted points + drop residuals targeting the frame + compact
        # device frame slots, all in one dispatch
        self.W = _marg_frame_mutations(
            self.W,
            pre_drop if pre_drop is not None
            else jnp.zeros(self.P, bool), jnp.int32(idx))
        self.n_frames -= 1
        self.pt_host_np = np.where(self.pt_host_np > idx,
                                   self.pt_host_np - 1, self.pt_host_np)

    # ------------------------------------------------------------------ points
    def marginalize_points(self, pt_mask: jax.Array, dIs: jax.Array):
        """flagged points: boost prior, relinearize+fix, mode-2 accumulate
        into HM/bM, then remove (marginalizePointsF, :165-222)."""
        mask_np = np.asarray(pt_mask)
        if not mask_np.any():
            return
        self.W, packed = _marg_points_dev(
            self.W, pt_mask, jnp.float32(self.cfg.idepth_fix_prior_marg_fac))
        Hb = np.asarray(packed, np.float64)
        n = CPARS + 8 * self.n_frames
        from ldso_tpu.config import (SOLVER_ORTHOGONALIZE_POINTMARG,
                                     SOLVER_ORTHOGONALIZE_FULL)
        if self.cfg.solver_mode & SOLVER_ORTHOGONALIZE_POINTMARG:
            # project HM/bM against the nullspaces before absorbing the
            # point system (EnergyFunctional.cc:205-212); skipped while the
            # pose-prior-carrying first frame is in the window
            if not any(getattr(f, "kf_id", -1) == 0
                       for f in self.window_shells):
                self.HM, self.bM = self._orthogonalize_system(self.HM, self.bM)
        self.HM += self.cfg.marg_weight_fac * Hb[:-2][:n, :n]
        self.bM += self.cfg.marg_weight_fac * Hb[-2][:n]
        if self.cfg.solver_mode & SOLVER_ORTHOGONALIZE_FULL:
            self.HM, self.bM = self._orthogonalize_system(self.HM, self.bM)
        self.res_in_m += int(Hb[-1, 0])
        self.pt_valid_np &= ~mask_np

    def insert_points(self, host_idx, u, v, color, weights, idepth,
                      energy_th, has_depth_prior=False) -> np.ndarray:
        """Place new active points into free slots; create residual slots to
        every other valid frame. Returns the slot indices used.
        host_idx may be a scalar or per-point array."""
        free = np.nonzero(~self.pt_valid_np)[0]
        k = min(len(free), len(u))
        host = np.broadcast_to(np.asarray(host_idx, np.int32), (len(u),))[:k]
        from ldso_tpu.config import SOLVER_REMOVE_POSEPRIOR
        prior = (self.cfg.idepth_fix_prior if has_depth_prior else 0.0)
        if self.cfg.solver_mode & SOLVER_REMOVE_POSEPRIOR:
            prior = 0.0     # PointHessian::takeData (PointHessian.h:111-115)

        # pad to a pow-2 bucket so the jitted inserter compiles O(log) times
        kb = _round_up_pow2(k)
        sl = np.full(kb, self.P, np.int32)
        sl[:k] = free[:k]
        ints = np.zeros((kb, 3), np.int32)
        ints[:, 0] = sl
        ints[:k, 1] = 1
        ints[:k, 2] = host
        floats = np.zeros((kb, 21), np.float32)
        floats[:k, 0] = np.asarray(u[:k], np.float32)
        floats[:k, 1] = np.asarray(v[:k], np.float32)
        floats[:k, 2] = np.asarray(idepth[:k], np.float32)
        floats[:k, 3] = prior
        floats[:k, 4] = np.asarray(energy_th[:k], np.float32)
        floats[:k, 5:13] = np.asarray(color[:k], np.float32)
        floats[:k, 13:21] = np.asarray(weights[:k], np.float32)
        self.W = _insert_points_dev(self.W, jnp.asarray(ints),
                                    jnp.asarray(floats))
        self.pt_valid_np[free[:k]] = True
        self.pt_host_np[free[:k]] = host
        return free[:k]

    def insert_keyframe(self, T_cw, exposure, aff, dIs, dI0):
        """insert_frame + add_residuals_to_frame + dI-stack update fused
        into one dispatch. Returns (idx, new_dIs)."""
        i = self.n_frames
        assert i < self.F, "window capacity exceeded"
        st = np.zeros(10, np.float32)
        st[6] = aff[0] / SCALE_A
        st[7] = aff[1] / SCALE_B
        prior = np.zeros(8, np.float32)
        prior[6] = (self.cfg.initial_aff_a_prior
                    if self.cfg.affine_opt_mode_a < 0 else self.cfg.affine_opt_mode_a)
        prior[7] = (self.cfg.initial_aff_b_prior
                    if self.cfg.affine_opt_mode_b < 0 else self.cfg.affine_opt_mode_b)
        self.W, dIs = _insert_keyframe_dev(
            self.W, dIs, jnp.int32(i), jnp.asarray(T_cw, jnp.float32),
            jnp.asarray(st), jnp.asarray(prior), jnp.float32(exposure),
            jnp.asarray(True), dI0)
        self.n_frames += 1
        # grow HM/bM with zeros for the new frame block
        n_old = self.HM.shape[0]
        HM = np.zeros((n_old + 8, n_old + 8), np.float64)
        HM[:n_old, :n_old] = self.HM
        bM = np.zeros(n_old + 8, np.float64)
        bM[:n_old] = self.bM
        self.HM, self.bM = HM, bM
        return i, dIs

    def add_residuals_to_frame(self, frame_idx: int):
        """Create residual slots from every active point to a (new) frame
        (FullSystem::makeKeyFrame :443-469)."""
        self.W = _add_residuals_dev(self.W, jnp.int32(frame_idx))

    def drop_points(self, pt_mask: jax.Array, pt_mask_np=None):
        """pt_mask_np: optional host mirror of pt_mask — avoids pulling the
        device mask back over the tunnel just to update the host mirrors."""
        self.W = _drop_points_dev(self.W, pt_mask)
        self.pt_valid_np &= ~(pt_mask_np if pt_mask_np is not None
                              else np.asarray(pt_mask))

    def marginalize_and_drop(self, marg_cand, drop,
                             dIs, img_w: int, img_h: int):
        """Fused end-of-keyframe point retirement (see _marg_points_fused):
        relin+fix the candidates, gate on idepth-Hessian quality, absorb the
        survivors into HM/bM, drop survivors+rejects — ONE device program,
        ONE pull. marg_cand/drop may be host or device masks. Returns
        (rec (P,4) [u,v,idepth,idepth_H], really_marg, dropped) as host
        arrays."""
        h = self.marginalize_and_drop_dispatch(marg_cand, drop, dIs,
                                               img_w, img_h)
        return self.marginalize_and_drop_consume(h)

    def marginalize_and_drop_dispatch(self, marg_cand, drop, dIs,
                                      img_w: int, img_h: int):
        """Dispatch half of marginalize_and_drop: queues the fused program
        (inputs may be device masks straight out of _post_ba_dev, so this
        can run before any pull) and starts the async result transfer."""
        self.W, packed = _marg_points_fused(
            self.W, jnp.asarray(marg_cand), jnp.asarray(drop), dIs,
            jnp.float32(self.cfg.min_idepth_h_marg),
            jnp.float32(self.cfg.idepth_fix_prior_marg_fac),
            self.cfg, img_w, img_h)
        packed.copy_to_host_async()
        return packed

    def marginalize_and_drop_consume(self, packed):
        """Pull half: read the (already landed) packed result, absorb the
        survivors' Schur system into HM/bM, update host mirrors."""
        from ldso_tpu.config import (SOLVER_ORTHOGONALIZE_POINTMARG,
                                     SOLVER_ORTHOGONALIZE_FULL)
        pk = np.asarray(packed, np.float64)
        nfull = pk.shape[1]
        H = pk[:nfull]
        b = pk[nfull]
        nres = pk[nfull + 1, 0]
        rows = (self.P + nfull - 1) // nfull
        off = nfull + 2
        fields = [pk[off + k * rows: off + (k + 1) * rows].reshape(-1)[:self.P]
                  for k in range(6)]
        rec = np.stack(fields[:4], axis=1)
        really = fields[4] > 0.5
        dropped = fields[5] > 0.5

        if really.any():
            n = CPARS + 8 * self.n_frames
            if self.cfg.solver_mode & SOLVER_ORTHOGONALIZE_POINTMARG:
                if not any(getattr(f, "kf_id", -1) == 0
                           for f in self.window_shells):
                    self.HM, self.bM = self._orthogonalize_system(
                        self.HM, self.bM)
            self.HM += self.cfg.marg_weight_fac * H[:n, :n]
            self.bM += self.cfg.marg_weight_fac * b[:n]
            if self.cfg.solver_mode & SOLVER_ORTHOGONALIZE_FULL:
                self.HM, self.bM = self._orthogonalize_system(self.HM, self.bM)
            self.res_in_m += int(nres)
        self.pt_valid_np &= ~(really | dropped)
        return rec, really, dropped

    # ------------------------------------------------------------------ solving
    def _nullspaces(self) -> np.ndarray:
        """Columns: 6 pose + 2 affine + 1 scale global null directions
        (getNullspaces, FullSystem.cc:1711-1760)."""
        nf = self.n_frames
        n = CPARS + 8 * nf
        W = self.W
        T_eval = np.asarray(W.T_eval[:nf], np.float64)
        adj = np.asarray(lie.se3_adj(jnp.asarray(T_eval)))      # (nf,6,6)
        aff0 = np.asarray(aff_g2l_zero(W))[:nf]
        expo = np.asarray(W.exposure[:nf])

        cols = []
        for i in range(6):
            x0 = np.zeros(n)
            for f in range(nf):
                seg = adj[f][:, i].copy()
                seg[0:3] /= SCALE_XI_TRANS
                seg[3:6] /= SCALE_XI_ROT
                x0[CPARS + 8 * f: CPARS + 8 * f + 6] = seg
            cols.append(x0)
        for i in range(2):
            x0 = np.zeros(n)
            for f in range(nf):
                if i == 0:
                    x0[CPARS + 8 * f + 6] = 1.0 / SCALE_A
                else:
                    x0[CPARS + 8 * f + 7] = np.exp(aff0[f, 0]) * expo[f] / SCALE_B
            cols.append(x0)
        x0 = np.zeros(n)
        for f in range(nf):
            t = T_eval[f][:3, 3]
            x0[CPARS + 8 * f: CPARS + 8 * f + 3] = t / SCALE_XI_TRANS
        cols.append(x0)
        return np.stack(cols, axis=1)  # (n, 9)

    @staticmethod
    def _orthogonalize(vec: np.ndarray, N: np.ndarray,
                       delta: float = 1e-5) -> np.ndarray:
        """x -= N (N^T N)^+ N^T x via SVD (EnergyFunctional.cc:685-717)."""
        Nn = N / np.maximum(np.linalg.norm(N, axis=0, keepdims=True), 1e-12)
        U, S, Vt = np.linalg.svd(Nn, full_matrices=False)
        Sinv = np.where(S > delta * S.max(), 1.0 / S, 0.0)
        Npi = U * Sinv[None, :] @ Vt                # pseudo-inverse pieces
        NNpiT = Nn @ Npi.T
        NNpiTS = 0.5 * (NNpiT + NNpiT.T)
        return vec - NNpiTS @ vec

    def _orth_nullspaces(self) -> np.ndarray:
        """Pose (6) + scale (1) nullspace columns — the set the reference's
        orthogonalize() actually uses (EnergyFunctional.cc:687-689 inserts
        only lastNullspaces_pose and _scale; affine has priors and is not a
        gauge freedom)."""
        N = self._nullspaces()
        return N[:, [0, 1, 2, 3, 4, 5, 8]]

    def _orthogonalize_system(self, H: np.ndarray, b: np.ndarray):
        """b -= Q b; H -= Q H Q with Q = N (N^T N)^+ N^T
        (EnergyFunctional::orthogonalize with a system argument,
        EnergyFunctional.cc:685-717)."""
        N = self._orth_nullspaces()
        Nn = N / np.maximum(np.linalg.norm(N, axis=0, keepdims=True), 1e-12)
        U, S, Vt = np.linalg.svd(Nn, full_matrices=False)
        Sinv = np.where(S > self.cfg.solver_mode_delta * S.max(),
                        1.0 / np.maximum(S, 1e-20), 0.0)
        Npi = U * Sinv[None, :] @ Vt
        Q = Nn @ Npi.T
        Q = 0.5 * (Q + Q.T)
        return H - Q @ H @ Q, b - Q @ b

    def solve_system(self, iteration: int, lam: float):
        """solveSystemF (EnergyFunctional.cc:240-351)."""
        cfg = self.cfg
        from ldso_tpu.config import (SOLVER_FIX_LAMBDA, SOLVER_USE_GN,
                                     SOLVER_ORTHOGONALIZE_X,
                                     SOLVER_ORTHOGONALIZE_X_LATER,
                                     SOLVER_ORTHOGONALIZE_SYSTEM,
                                     SOLVER_SVD, SOLVER_SVD_CUT7)
        if cfg.solver_mode & SOLVER_USE_GN:
            lam = 0.0
        if cfg.solver_mode & SOLVER_FIX_LAMBDA:
            lam = 1e-5

        HA, bA, HL, bL, Hsc, bsc, aux, delta, nresA = ba.build_system(self.W)
        n = CPARS + 8 * self.n_frames
        HA = np.asarray(HA, np.float64)[:n, :n]
        bA = np.asarray(bA, np.float64)[:n]
        HL = np.asarray(HL, np.float64)[:n, :n]
        bL = np.asarray(bL, np.float64)[:n]
        Hsc_n = np.asarray(Hsc, np.float64)[:n, :n]
        bsc_n = np.asarray(bsc, np.float64)[:n]
        delta = np.asarray(delta, np.float64)[:n]
        self.res_in_a = int(nresA)

        bM_top = self.bM + self.HM @ delta
        didx = np.diag_indices(n)
        if cfg.solver_mode & SOLVER_ORTHOGONALIZE_SYSTEM:
            # orthogonalize the ACTIVE system before adding the marg prior
            # (EnergyFunctional.cc:262-281); skipped while frame 0 (with its
            # pose prior) is still in the window
            HT = HL + HA - Hsc_n
            bT = bL + bA - bsc_n
            have_first = any(getattr(f, "kf_id", -1) == 0
                             for f in getattr(self, "window_shells", []))
            if not have_first:
                HT, bT = self._orthogonalize_system(HT, bT)
            HFinal = HT + self.HM
            bFinal = bT + bM_top
            HFinal[didx] *= (1.0 + lam)
        else:
            HFinal = HL + self.HM + HA
            bFinal = bL + bM_top + bA - bsc_n
            HFinal[didx] *= (1.0 + lam)
            HFinal = HFinal - Hsc_n * (1.0 / (1.0 + lam))

        if cfg.solver_mode & SOLVER_SVD:
            # scaled SVD solve with singular-value gating
            # (EnergyFunctional.cc:296-324)
            SVecI = 1.0 / np.sqrt(np.abs(np.diag(HFinal)) + 1e-12)
            Hs = SVecI[:, None] * HFinal * SVecI[None, :]
            bs = SVecI * bFinal
            U, S, Vt = np.linalg.svd(Hs)
            Ub = U.T @ bs
            max_sv = S.max() if len(S) else 1.0
            for i in range(len(Ub)):
                if S[i] < cfg.solver_mode_delta * max_sv:
                    Ub[i] = 0.0
                if (cfg.solver_mode & SOLVER_SVD_CUT7) and i >= len(Ub) - 7:
                    Ub[i] = 0.0
                else:
                    Ub[i] /= max(S[i], 1e-20)
            x = SVecI * (Vt.T @ Ub)
        else:
            # abs() guards a (numerically) negative diagonal, matching the
            # device solver (ba_device.py) — a raw sqrt silently NaNs the
            # whole solve on one bad entry.
            SVecI = 1.0 / np.sqrt(np.abs(np.diag(HFinal)) + 10.0)
            Hs = SVecI[:, None] * HFinal * SVecI[None, :]
            bs = SVecI * bFinal
            x = SVecI * np.linalg.solve(Hs, bs)

        if (cfg.solver_mode & SOLVER_ORTHOGONALIZE_X) or (
                iteration >= 2 and (cfg.solver_mode & SOLVER_ORTHOGONALIZE_X_LATER)):
            x = self._orthogonalize(x, self._orth_nullspaces(),
                                    cfg.solver_mode_delta)

        xf = np.zeros(CPARS + 8 * self.F, np.float32)
        xf[:n] = x
        x_dev = jnp.asarray(xf)
        self.W = ba.resubstitute(self.W, x_dev, aux["HdiF"], aux["bdSum"],
                                 aux["Hcd"], aux["JpJdF"])
        self.W = self.W._replace(pt_idepth_hessian=1.0 / jnp.maximum(aux["HdiF"], 1e-12))
        self.last_x = x
        return x

    def calc_M_energy(self) -> float:
        if self.cfg.force_accept_step:
            return 0.0
        _, _, _, _, _, _, _, delta, _ = ba.build_system(self.W)
        n = CPARS + 8 * self.n_frames
        d = np.asarray(delta, np.float64)[:n]
        return float(d @ (2.0 * self.bM + self.HM @ d))

    def calc_L_energy(self) -> float:
        if self.cfg.force_accept_step:
            return 0.0
        return float(ba.calc_L_energy(self.W))

    # ------------------------------------------------------------------ optimize
    def optimize(self, dIs: jax.Array, max_iterations: int,
                 img_w: int, img_h: int, defer_stats: bool = False):
        """The windowed BA LM loop (FullSystem::optimize, :725-864).
        Returns the final RMSE; sets self.is_lost on divergence.

        Default mode (forceAcceptStep + FIX_LAMBDA, the reference defaults)
        runs as ONE device program (backend/ba_device.py); the general
        accept/reject LM falls back to the host-orchestrated loop below.

        defer_stats (device path only): return the device [energy, res_in_a,
        rmse] handle with an async pull already started instead of blocking —
        the caller queues more work behind the BA and calls
        `consume_stats(handle)` after its own next sync point, when the
        transfer has already landed."""
        cfg = self.cfg
        nf = self.n_frames
        if nf < 2:
            return 0.0
        if nf < 3:
            max_iterations = 20
        elif nf < 4:
            max_iterations = 15
        newest = nf - 1

        from ldso_tpu.config import SOLVER_MOMENTUM
        momentum = bool(cfg.solver_mode & SOLVER_MOMENTUM)
        if cfg.ba_device_lm and cfg.force_accept_step and not momentum:
            from ldso_tpu.backend import ba_device
            n_full = CPARS + 8 * self.F
            HMp = np.zeros((n_full, n_full), np.float32)
            bMp = np.zeros(n_full, np.float32)
            n = CPARS + 8 * nf
            HMp[:n, :n] = self.HM
            bMp[:n] = self.bM
            self.W, stats = ba_device.optimize_device(
                self.W, dIs, jnp.asarray(HMp), jnp.asarray(bMp),
                jnp.int32(newest), cfg, img_w, img_h, max_iterations)
            if defer_stats:
                from ldso_tpu.utils.transfer import _pad64
                h = _pad64(stats)
                h.copy_to_host_async()
                return h
            from ldso_tpu.utils.transfer import device_get
            stats = device_get(stats)
            self.res_in_a = int(stats[1])
            if not np.isfinite(stats[0]):
                self.is_lost = True
            return float(stats[2])

        if defer_stats:
            raise ValueError("defer_stats requires the device LM path "
                             "(force_accept_step without SOLVER_MOMENTUM)")
        return self._optimize_host(dIs, max_iterations, img_w, img_h,
                                   newest, momentum)

    def consume_stats(self, handle) -> float:
        """Finish a defer_stats=True optimize: read the (already landed)
        async stats transfer and apply the divergence bookkeeping."""
        stats = np.asarray(handle)[:3]
        self.res_in_a = int(stats[1])
        if not np.isfinite(stats[0]):
            self.is_lost = True
        return float(stats[2])

    def _optimize_host(self, dIs, max_iterations, img_w, img_h,
                       newest, momentum):
        cfg = self.cfg
        from ldso_tpu.utils.transfer import device_get_scalar
        self.W = _reset_oob(self.W)
        self.W, eP = ba.linearize_all(self.W, dIs, cfg, img_w, img_h)
        self.W = ba.set_new_frame_energy_th(self.W, jnp.int32(newest), cfg)
        last_energy = device_get_scalar(eP)
        lastL = self.calc_L_energy()
        lastM = self.calc_M_energy()
        self.W = ba.apply_res(self.W)

        lam = 1e-1
        stepsize = 1.0
        prev_x = None
        from ldso_tpu.config import SOLVER_STEPMOMENTUM
        for iteration in range(max_iterations):
            self.W = ba.backup_state(self.W)
            if momentum:
                # backupState(iteration != 0) momentum semantics
                # (FullSystem.cc:1627-1650): the previous raw solver step is
                # what the blended update mixes in; zero on iteration 0.
                if iteration != 0:
                    prev_fstep, prev_pstep = self.W.frame_step, self.W.pt_step
                else:
                    prev_fstep = jnp.zeros_like(self.W.frame_step)
                    prev_pstep = jnp.zeros_like(self.W.pt_step)
            self.solve_system(iteration, lam)
            # step-direction momentum (FullSystem.cc:781-793): grow the step
            # when successive increments align, shrink when they oppose
            if (cfg.solver_mode & SOLVER_STEPMOMENTUM) and prev_x is not None:
                inc = ((1e-20 + prev_x @ self.last_x)
                       / (1e-20 + np.linalg.norm(prev_x)
                          * np.linalg.norm(self.last_x)))
                if np.isfinite(inc):
                    if inc < 0 and stepsize > 1:
                        stepsize = 1.0
                    new_ss = np.exp(inc * 1.4)
                    stepsize = float(np.clip(
                        np.sqrt(np.sqrt(new_ss * stepsize ** 3)), 0.25, 2.0))
            prev_x = self.last_x
            if momentum:
                self.W, canbreak = ba.do_step_momentum(
                    self.W, prev_fstep, prev_pstep)
            else:
                self.W, canbreak = ba.do_step(self.W, stepsize, stepsize,
                                              stepsize, stepsize, stepsize)
            canbreak = bool(device_get_scalar(canbreak))

            self.W, eP = ba.linearize_all(self.W, dIs, cfg, img_w, img_h)
            self.W = ba.set_new_frame_energy_th(self.W, jnp.int32(newest), cfg)
            newL = self.calc_L_energy()
            newM = self.calc_M_energy()
            new_energy = device_get_scalar(eP)

            if cfg.force_accept_step or (new_energy + newL + newM
                                         < last_energy + lastL + lastM):
                self.W = ba.apply_res(self.W)
                last_energy, lastL, lastM = new_energy, newL, newM
                lam *= 0.25
            else:
                self.W = ba.load_backup(self.W)
                self.W, eP = ba.linearize_all(self.W, dIs, cfg, img_w, img_h)
                self.W = ba.set_new_frame_energy_th(self.W, jnp.int32(newest), cfg)
                last_energy = device_get_scalar(eP)
                lastL = self.calc_L_energy()
                lastM = self.calc_M_energy()
                lam *= 1e2

            if canbreak and iteration >= cfg.min_opt_iterations:
                break

        # re-fix the newest frame's evaluation point, keeping (a, b)
        # (FullSystem.cc:833-841)
        W = self.W
        T_cur = current_poses(W)
        new_zero = jnp.zeros(10, jnp.float32)
        new_zero = new_zero.at[6:8].set(W.state[newest, 6:8])
        self.W = W._replace(
            T_eval=W.T_eval.at[newest].set(T_cur[newest]),
            state=W.state.at[newest].set(new_zero),
            state_zero=W.state_zero.at[newest].set(new_zero),
        )

        self.W = _reset_oob(self.W)
        self.W, eP = ba.linearize_all(self.W, dIs, cfg, img_w, img_h)
        self.W = ba.set_new_frame_energy_th(self.W, jnp.int32(newest), cfg)
        self.W = _finalize_linearization(self.W)
        last_energy = device_get_scalar(eP)
        if not np.isfinite(last_energy):
            self.is_lost = True
        rmse = np.sqrt(last_energy / max(8 * self.res_in_a, 1))
        return float(rmse)


import functools


@jax.jit
def _marg_frame_mutations(W: Window, pre_drop, idx) -> Window:
    """drop_points(pre_drop) + residual-column drop + _shift_frame_out as
    one program (frame marginalization's device side). idx traced — one
    executable for all window slots."""
    W = _drop_points_dev(W, pre_drop)
    col = jax.nn.one_hot(idx, W.F, dtype=bool)[None, :]
    W = W._replace(
        res_exist=W.res_exist & ~col,
        res_active=W.res_active & ~col,
    )
    return _shift_frame_out(W, idx)


@jax.jit
def _shift_frame_out(W: Window, idx) -> Window:
    """Remove frame slot idx; shift higher slots down by one (device).
    idx is TRACED: one compiled executable covers every slot (a static idx
    builds F executables, each paying a ~0.3-0.9 s compile-cache load the
    first time a run marginalizes that slot)."""
    F = W.F
    ar = jnp.arange(F)
    perm = jnp.where(ar < idx, ar, jnp.where(ar < F - 1, ar + 1, idx))

    def shift_f(a, axis):
        return jnp.take(a, perm, axis=axis)

    # remap pt_host: hosts > idx shift down (points hosted at idx must have
    # been removed by the caller beforehand)
    new_host = jnp.where(W.pt_host > idx, W.pt_host - 1, W.pt_host)
    last = F - 1
    W = W._replace(
        frame_valid=shift_f(W.frame_valid, 0).at[last].set(False),
        T_eval=shift_f(W.T_eval, 0),
        state=shift_f(W.state, 0), state_zero=shift_f(W.state_zero, 0),
        state_backup=shift_f(W.state_backup, 0),
        frame_step=shift_f(W.frame_step, 0),
        exposure=shift_f(W.exposure, 0), prior=shift_f(W.prior, 0),
        frame_energy_th=shift_f(W.frame_energy_th, 0),
        pt_host=new_host,
        res_exist=shift_f(W.res_exist, 1).at[:, last].set(False),
        res_active=shift_f(W.res_active, 1).at[:, last].set(False),
        res_linearized=shift_f(W.res_linearized, 1).at[:, last].set(False),
        res_state=shift_f(W.res_state, 1),
        res_energy=shift_f(W.res_energy, 1),
        res_new_state=shift_f(W.res_new_state, 1),
        res_new_energy=shift_f(W.res_new_energy, 1),
        res_new_energy_wo=shift_f(W.res_new_energy_wo, 1),
        res_toZero=shift_f(W.res_toZero, 1),
        Jpdxi=shift_f(W.Jpdxi, 1), Jpdc=shift_f(W.Jpdc, 1),
        Jpdd=shift_f(W.Jpdd, 1), JIdx=shift_f(W.JIdx, 1),
        JabF=shift_f(W.JabF, 1), resF=shift_f(W.resF, 1),
        center_proj=shift_f(W.center_proj, 1),
    )
    return W
