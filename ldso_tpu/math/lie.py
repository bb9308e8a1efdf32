"""Batched SO(3) / SE(3) / Sim(3) Lie-group operations in pure JAX.

TPU-native replacement for the vendored Sophus headers the reference links
everywhere (reference: thirdparty/sophus, include/NumTypes.h:8-28). All ops
broadcast over arbitrary leading batch dimensions and are differentiable, so
pose-graph / Sim(3) refinement Jacobians can come from `jax.jacfwd` instead
of the reference's hand-written or numeric Jacobians (src/internal/PR.h).

Conventions (Sophus-compatible, so trajectories interoperate):
  * SE3 tangent  xi = [upsilon(3), omega(3)]           (trans first)
  * Sim3 tangent xi = [upsilon(3), omega(3), sigma(1)] (log-scale last)
  * Group elements are 4x4 homogeneous matrices; for Sim3 the top-left
    3x3 block is s*R.

Small-angle branches use Taylor expansions selected with `jnp.where`, making
every function safe under `jit`/`vmap`/`grad` at theta == 0.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8
# Tiny additive guard inside sqrt so every function stays differentiable at
# theta == 0 (d sqrt(x)/dx blows up at 0 and leaks NaNs through jnp.where
# branches under jacfwd — the pose-graph optimizer differentiates exp/log
# at exactly zero-residual edges).
_SQRT_GUARD = 1e-30


def _safe_sqrt(x):
    return jnp.sqrt(x + _SQRT_GUARD)


def _safe_norm(x, axis=-1, keepdims=False):
    return _safe_sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))


def hat(w):
    """so(3) hat operator: (...,3) -> (...,3,3)."""
    w = jnp.asarray(w)
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _eye_like(w, n):
    batch = w.shape[:-1]
    return jnp.broadcast_to(jnp.eye(n, dtype=w.dtype), batch + (n, n))


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_exp(omega):
    """Rodrigues: (...,3) -> (...,3,3)."""
    omega = jnp.asarray(omega)
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = _safe_sqrt(theta2)
    small = theta < 1e-4   # Taylor accurate to ~1e-16 here
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2)
    )
    W = hat(omega)
    W2 = W @ W
    return _eye_like(omega, 3) + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """(...,3,3) -> (...,3). Robust near theta = 0 and theta = pi.

    theta is recovered from atan2(|vee(R - R^T)|/2, (tr - 1)/2), which stays
    accurate at both ends of [0, pi] (arccos of the trace alone loses
    ~sqrt(eps) digits near pi)."""
    R = jnp.asarray(R)
    a = 0.5 * vee(R - jnp.swapaxes(R, -1, -2))        # = sin(theta) * axis
    sin_t = _safe_norm(a)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arctan2(sin_t, cos_t)

    # generic / small-angle: w = a * theta / sin(theta)
    small = sin_t < 1e-4
    factor = jnp.where(small, 1.0 + theta * theta / 6.0,
                       theta / jnp.where(small, 1.0, sin_t))
    w_generic = factor[..., None] * a

    # theta ~ pi (sin vanishes, cos < 0): axis from the diagonal of
    # R = I + (1 - cos) [n]x^2 + sin [n]x  =>  n_i^2 ~= (R_ii + 1)/2.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    n_abs = _safe_sqrt(jnp.maximum((diag + 1.0) * 0.5, 0.0))
    # fix relative signs from the column of R + I with the largest |n_k|
    # (column k of R + I is 2 n n_k at theta == pi).
    k = jnp.argmax(n_abs, axis=-1)
    RpI = R + _eye_like(a, 3)
    col = jnp.take_along_axis(RpI, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    n = jnp.sign(jnp.where(col == 0.0, 1.0, col)) * n_abs
    n = n / jnp.maximum(_safe_norm(n, keepdims=True), _EPS)
    # align overall sign with the antisymmetric part when it is nonzero
    flip = jnp.sum(n * a, axis=-1) < 0.0
    n = jnp.where(flip[..., None], -n, n)
    w_pi = theta[..., None] * n

    near_pi = (sin_t < 1e-4) & (cos_t < 0.0)
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _so3_left_jacobian_coeffs(omega):
    """Coefficients (a, b) of V = I + a*W + b*W^2 (left Jacobian of SO3)."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = _safe_sqrt(theta2)
    small = theta < 1e-4
    safe_t2 = jnp.where(small, 1.0, theta2)
    safe_t3 = safe_t2 * jnp.where(small, 1.0, theta)
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / safe_t3)
    return a, b


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3(R, t):
    """Assemble 4x4 from (...,3,3) and (...,3)."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), batch + (4, 4))
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T


def se3_exp(xi):
    """(...,6) [v, w] -> (...,4,4)."""
    xi = jnp.asarray(xi)
    v, w = xi[..., :3], xi[..., 3:6]
    R = so3_exp(w)
    a, b = _so3_left_jacobian_coeffs(w)
    W = hat(w)
    V = _eye_like(w, 3) + a[..., None, None] * W + b[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return se3(R, t)


def se3_log(T):
    """(...,4,4) -> (...,6) [v, w]."""
    T = jnp.asarray(T)
    w = so3_log(T[..., :3, :3])
    a, b = _so3_left_jacobian_coeffs(w)
    W = hat(w)
    V = _eye_like(w, 3) + a[..., None, None] * W + b[..., None, None] * (W @ W)
    v = jnp.linalg.solve(V, T[..., :3, 3][..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def se3_inv(T):
    T = jnp.asarray(T)
    Rt = jnp.swapaxes(T[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", Rt, T[..., :3, 3])
    return se3(Rt, t)


def se3_adj(T):
    """Adjoint: (...,4,4) -> (...,6,6) for tangent order [v, w]."""
    T = jnp.asarray(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    batch = T.shape[:-2]
    A = jnp.zeros(batch + (6, 6), dtype=T.dtype)
    A = A.at[..., :3, :3].set(R)
    A = A.at[..., :3, 3:].set(hat(t) @ R)
    A = A.at[..., 3:, 3:].set(R)
    return A


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------

def sim3(R, t, s):
    """Assemble 4x4 Sim(3) from rotation, translation, scale."""
    R = jnp.asarray(R)
    s = jnp.asarray(s)
    return se3(s[..., None, None] * R, t)


def sim3_scale(S):
    """Recover scale s = det(sR)^(1/3)."""
    return jnp.cbrt(jnp.linalg.det(jnp.asarray(S)[..., :3, :3]))


def sim3_rt(S):
    """Split Sim3 into (R, t, s)."""
    S = jnp.asarray(S)
    s = sim3_scale(S)
    R = S[..., :3, :3] / s[..., None, None]
    return R, S[..., :3, 3], s


def _sim3_W_coeffs(theta, sigma):
    """W = alpha*I + (beta/theta)*What + (gamma/theta^2)*What^2 with
    W = integral_0^1 e^{sigma u} exp(u*What) du. Returns the three scalar
    coefficients (of I, What, What^2) with all singular limits handled.

    The Taylor branches take over at 1e-4 — well before the closed forms
    (whose numerators cancel to O(theta^3)) lose precision; the series are
    accurate to ~1e-12 there."""
    theta2 = theta * theta
    sigma2 = sigma * sigma
    es = jnp.exp(sigma)
    t_small = theta < 1e-4
    s_small = jnp.abs(sigma) < 1e-4

    # alpha = expm1(sigma)/sigma
    alpha = jnp.where(s_small, 1.0 + sigma / 2.0 + sigma2 / 6.0,
                      jnp.expm1(sigma) / jnp.where(s_small, 1.0, sigma))

    # when theta >= 1e-4 the denominator is >= 1e-8; the guard only protects
    # the branch that is discarded by t_small anyway
    denom = jnp.where((sigma2 + theta2) < 1e-12, 1.0, sigma2 + theta2)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    # generic closed forms (valid when theta not small)
    safe_t = jnp.where(t_small, 1.0, theta)
    beta_over_t = (es * (sigma * sin_t - theta * cos_t) + theta) / (denom * safe_t)
    int_cos = (es * (sigma * cos_t + theta * sin_t) - sigma) / denom
    gamma_over_t2 = (alpha - int_cos) / jnp.where(t_small, 1.0, theta2)

    # theta -> 0 limits (sigma arbitrary):
    #   beta/theta  -> int_0^1 u e^{su} du       = (e^s (s-1) + 1)/s^2
    #   gamma/th^2  -> int_0^1 u^2 e^{su} du / 2 = (e^s (s^2-2s+2) - 2)/(2 s^3)
    safe_s2 = jnp.where(s_small, 1.0, sigma2)
    safe_s3 = safe_s2 * jnp.where(s_small, 1.0, sigma)
    bt_lim = jnp.where(s_small, 0.5 + sigma / 3.0 + sigma2 / 8.0,
                       (es * (sigma - 1.0) + 1.0) / safe_s2)
    gt_lim = jnp.where(s_small, 1.0 / 6.0 + sigma / 8.0 + sigma2 / 20.0,
                       (es * (sigma2 - 2.0 * sigma + 2.0) - 2.0) / (2.0 * safe_s3))

    beta_over_t = jnp.where(t_small, bt_lim, beta_over_t)
    gamma_over_t2 = jnp.where(t_small, gt_lim, gamma_over_t2)
    return alpha, beta_over_t, gamma_over_t2


def sim3_W(omega, sigma):
    """The Sim(3) 'V' matrix such that t = W @ upsilon in sim3_exp."""
    theta = _safe_norm(omega)
    alpha, bt, gt2 = _sim3_W_coeffs(theta, sigma)
    Wh = hat(omega)
    return (
        alpha[..., None, None] * _eye_like(omega, 3)
        + bt[..., None, None] * Wh
        + gt2[..., None, None] * (Wh @ Wh)
    )


def sim3_exp(xi):
    """(...,7) [v, w, sigma] -> (...,4,4)."""
    xi = jnp.asarray(xi)
    v, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(w)
    s = jnp.exp(sigma)
    W = sim3_W(w, sigma)
    t = jnp.einsum("...ij,...j->...i", W, v)
    return sim3(R, t, s)


def sim3_log(S):
    """(...,4,4) -> (...,7) [v, w, sigma]."""
    R, t, s = sim3_rt(S)
    sigma = jnp.log(s)
    w = so3_log(R)
    W = sim3_W(w, sigma)
    v = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([v, w, sigma[..., None]], axis=-1)


def sim3_inv(S):
    R, t, s = sim3_rt(S)
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    return sim3(Rt, t_inv, s_inv)


def sim3_adj(S):
    """Adjoint: (...,4,4) -> (...,7,7), tangent order [v, w, sigma]
    (Sophus-compatible: Adj = [[sR, hat(t)R, -t], [0, R, 0], [0, 0, 1]])."""
    R, t, s = sim3_rt(S)
    batch = R.shape[:-2]
    A = jnp.zeros(batch + (7, 7), dtype=R.dtype)
    A = A.at[..., :3, :3].set(s[..., None, None] * R)
    A = A.at[..., :3, 3:6].set(hat(t) @ R)
    A = A.at[..., :3, 6].set(-t)
    A = A.at[..., 3:6, 3:6].set(R)
    A = A.at[..., 6, 6].set(1.0)
    return A


def se3_to_sim3(T):
    """Embed SE(3) as Sim(3) with unit scale (identity on matrices)."""
    return jnp.asarray(T)


def sim3_to_se3(S):
    """Project Sim(3) to SE(3) by dropping scale (keeps translation)."""
    R, t, _ = sim3_rt(S)
    return se3(R, t)


# ---------------------------------------------------------------------------
# Quaternion interop (for trajectory writers; TUM format is t + q)
# ---------------------------------------------------------------------------

def rotmat_to_quat(R):
    """(...,3,3) -> (...,4) quaternion (x, y, z, w), Shepperd's method."""
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _mk(w, x, y, z):
        return jnp.stack([x, y, z, w], axis=-1)

    q0 = _mk(jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0,
             (m21 - m12) / (2.0 * jnp.sqrt(jnp.maximum(1.0 + tr, _EPS))),
             (m02 - m20) / (2.0 * jnp.sqrt(jnp.maximum(1.0 + tr, _EPS))),
             (m10 - m01) / (2.0 * jnp.sqrt(jnp.maximum(1.0 + tr, _EPS))))
    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS))
    q1 = _mk((m21 - m12) / (2.0 * sx), sx / 2.0,
             (m01 + m10) / (2.0 * sx), (m02 + m20) / (2.0 * sx))
    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS))
    q2 = _mk((m02 - m20) / (2.0 * sy), (m01 + m10) / (2.0 * sy),
             sy / 2.0, (m12 + m21) / (2.0 * sy))
    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS))
    q3 = _mk((m10 - m01) / (2.0 * sz), (m02 + m20) / (2.0 * sz),
             (m12 + m21) / (2.0 * sz), sz / 2.0)

    # choose the numerically best representation
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q):
    """(...,4) (x, y, z, w) -> (...,3,3)."""
    q = jnp.asarray(q)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1)
    row1 = jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1)
    row2 = jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)
