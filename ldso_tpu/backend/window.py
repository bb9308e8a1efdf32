"""Sliding-window state as fixed-capacity device arrays.

The reference scatters this state across FrameHessian / PointHessian /
PointFrameResidual heap objects linked by pointers (SURVEY.md §2 C7-C12).
The TPU build keeps one struct-of-arrays pytree with static capacities:

  * frames: F slots (window of <= max_frames+1 during a KF insertion)
  * points: P slots, each carrying its host-frame slot index
  * residuals: dense (P, F) lattice — slot (p, t) is the residual of point
    p observed in frame t (nonexistent/dead residuals are masked). This
    regular lattice is what makes every per-residual loop of the reference
    one batched tensor op here.

State parameterization matches the reference exactly:
  * frame state x (10,) is the UNSCALED parameter; the physical increment
    is S x with S = diag(SCALE_XI_TRANS*3, SCALE_XI_ROT*3, SCALE_A, SCALE_B,
    SCALE_A, SCALE_B); current pose = exp((Sx)[:6]) * T_eval (left eps;
    FrameHessian.h:78-104).
  * calib c (4,) unscaled; physical [fx fy cx cy] = [S_F S_F S_C S_C] c.
  * idepth is the physical inverse depth (SCALE_IDEPTH == 1).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldso_tpu.config import (CPARS, SCALE_A, SCALE_B, SCALE_C, SCALE_F,
                             SCALE_XI_ROT, SCALE_XI_TRANS)

# residual states (Residuals.h ResState)
RES_IN = 0
RES_OOB = 1
RES_OUTLIER = 2

# the unscaled->scaled diagonal for the 8-dof frame parameters
FRAME_SCALE = np.array([SCALE_XI_TRANS] * 3 + [SCALE_XI_ROT] * 3
                       + [SCALE_A, SCALE_B], np.float32)
C_SCALE = np.array([SCALE_F, SCALE_F, SCALE_C, SCALE_C], np.float32)


class Window(NamedTuple):
    """All device-side window state. F/P are static capacities."""

    # frames -----------------------------------------------------------------
    frame_valid: jax.Array      # (F,) bool
    T_eval: jax.Array           # (F,4,4) worldToCam at the FEJ point
    state: jax.Array            # (F,10) unscaled [t(3) w(3) a b a' b']
    state_zero: jax.Array       # (F,10)
    state_backup: jax.Array     # (F,10)
    frame_step: jax.Array       # (F,10)
    exposure: jax.Array         # (F,)
    prior: jax.Array            # (F,8) diagonal prior
    frame_energy_th: jax.Array  # (F,)
    # calib -------------------------------------------------------------------
    c_value: jax.Array          # (4,) unscaled
    c_zero: jax.Array
    c_backup: jax.Array
    c_step: jax.Array
    c_prior: jax.Array          # (4,)
    # points ------------------------------------------------------------------
    pt_valid: jax.Array         # (P,) bool (ACTIVE in the energy)
    pt_host: jax.Array          # (P,) int32 frame slot
    pt_u: jax.Array             # (P,)
    pt_v: jax.Array
    pt_color: jax.Array         # (P,8)
    pt_weights: jax.Array       # (P,8)
    idepth: jax.Array           # (P,)
    idepth_zero: jax.Array
    idepth_backup: jax.Array
    pt_step: jax.Array
    pt_prior: jax.Array         # (P,) priorF
    pt_energy_th: jax.Array     # (P,)
    pt_num_good_res: jax.Array  # (P,) int32 numGoodResiduals
    pt_max_rel_baseline: jax.Array  # (P,)
    pt_idepth_hessian: jax.Array    # (P,)
    # residual lattice (P, F) --------------------------------------------------
    res_exist: jax.Array        # (P,F) bool: residual slot is alive
    res_active: jax.Array       # (P,F) bool: isActiveAndIsGoodNEW
    res_linearized: jax.Array   # (P,F) bool
    res_state: jax.Array        # (P,F) int32 RES_*
    res_energy: jax.Array       # (P,F)
    res_new_state: jax.Array    # (P,F) int32
    res_new_energy: jax.Array
    res_new_energy_wo: jax.Array  # state_NewEnergyWithOutlier
    res_toZero: jax.Array       # (P,F,8)
    # raw Jacobian factors (Residuals.h RawResidualJacobian)
    Jpdxi: jax.Array            # (P,F,2,6)
    Jpdc: jax.Array             # (P,F,2,4)
    Jpdd: jax.Array             # (P,F,2)
    JIdx: jax.Array             # (P,F,2,8)
    JabF: jax.Array             # (P,F,2,8)
    resF: jax.Array             # (P,F,8)
    center_proj: jax.Array     # (P,F,3) centerProjectedTo

    @property
    def F(self) -> int:
        return self.frame_valid.shape[0]

    @property
    def P(self) -> int:
        return self.pt_valid.shape[0]


def empty_window(F: int, P: int, c_init, cfg) -> Window:
    """Fresh window with intrinsics c_init = physical [fx fy cx cy]."""
    f32 = jnp.float32
    z = jnp.zeros
    c_phys = jnp.asarray(c_init, f32)
    c = c_phys / jnp.asarray(C_SCALE)
    return Window(
        frame_valid=z(F, bool),
        T_eval=jnp.broadcast_to(jnp.eye(4, dtype=f32), (F, 4, 4)),
        state=z((F, 10), f32), state_zero=z((F, 10), f32),
        state_backup=z((F, 10), f32), frame_step=z((F, 10), f32),
        exposure=jnp.ones(F, f32),
        prior=z((F, 8), f32),
        frame_energy_th=jnp.full((F,), 12.0 * 12.0 * 8.0, f32),
        c_value=c, c_zero=c, c_backup=c, c_step=z(4, f32),
        c_prior=jnp.full((4,), cfg.initial_calib_hessian, f32),
        pt_valid=z(P, bool), pt_host=z(P, jnp.int32),
        pt_u=z(P, f32), pt_v=z(P, f32),
        pt_color=z((P, 8), f32), pt_weights=z((P, 8), f32),
        idepth=z(P, f32), idepth_zero=z(P, f32), idepth_backup=z(P, f32),
        pt_step=z(P, f32), pt_prior=z(P, f32),
        pt_energy_th=z(P, f32),
        pt_num_good_res=z(P, jnp.int32),
        pt_max_rel_baseline=z(P, f32),
        pt_idepth_hessian=z(P, f32),
        res_exist=z((P, F), bool), res_active=z((P, F), bool),
        res_linearized=z((P, F), bool),
        res_state=jnp.full((P, F), RES_OUTLIER, jnp.int32),
        res_energy=z((P, F), f32),
        res_new_state=jnp.full((P, F), RES_OUTLIER, jnp.int32),
        res_new_energy=z((P, F), f32), res_new_energy_wo=z((P, F), f32),
        res_toZero=z((P, F, 8), f32),
        Jpdxi=z((P, F, 2, 6), f32), Jpdc=z((P, F, 2, 4), f32),
        Jpdd=z((P, F, 2), f32), JIdx=z((P, F, 2, 8), f32),
        JabF=z((P, F, 2, 8), f32), resF=z((P, F, 8), f32),
        center_proj=z((P, F, 3), f32),
    )


def scaled_state(state):
    """(..., 10) unscaled -> scaled (physical) parameters."""
    s = jnp.concatenate([jnp.asarray(FRAME_SCALE),
                         jnp.asarray([SCALE_A, SCALE_B], jnp.float32)])
    return state * s


def c_scaled(c_value):
    return c_value * jnp.asarray(C_SCALE)


def current_poses(W: Window):
    """(F,4,4) current worldToCam = exp(scaled_state[:6]) @ T_eval."""
    from ldso_tpu.math import lie
    xi = scaled_state(W.state)[:, :6]
    return lie.se3_exp(xi) @ W.T_eval


def aff_g2l(W: Window):
    """(F,2) current affine (a, b)."""
    s = scaled_state(W.state)
    return s[:, 6:8]


def aff_g2l_zero(W: Window):
    s = scaled_state(W.state_zero)
    return s[:, 6:8]
