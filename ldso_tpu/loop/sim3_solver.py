"""Sim(3) relative-pose estimation for loop closing.

The reference pipeline (LoopClosing::CorrectLoop + ComputeOptimizedPose,
src/frontend/LoopClosing.cc:145-496) seeds with OpenCV solvePnPRansac and
refines with a g2o graph of EdgePointSim3 (3D-3D) + EdgeProjectPoseOnlySim3
(2D reprojection) edges under Huber kernels.

TPU-native equivalents:
  * `umeyama_ransac`: closed-form Sim(3) from 3-point minimal sets, ALL
    hypotheses evaluated as one batched program (3x3 SVDs batch fine on
    TPU, unlike the quartic-root P3P solvers) — both frames have inverse
    depths in LDSO, so 3D-3D alignment directly observes scale.
  * `refine_sim3`: Gauss-Newton over the 7-dof Sim3 with the same two
    residual types + Huber weights, Jacobians by jacfwd; returns the 7x7
    Hessian used as the poseRel edge information (LoopClosing.cc:490-496).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ldso_tpu.math import lie


@jax.jit
def umeyama_sim3(P: jax.Array, Q: jax.Array, w: jax.Array):
    """Weighted Umeyama: Sim3 S with Q ~= s R P + t (maps P-frame to
    Q-frame). P, Q: (N,3); w: (N,) weights. Returns (4,4)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    wn = w / wsum
    muP = jnp.sum(wn[:, None] * P, axis=0)
    muQ = jnp.sum(wn[:, None] * Q, axis=0)
    Pc = P - muP
    Qc = Q - muQ
    cov = jnp.einsum("n,ni,nj->ij", wn, Qc, Pc)
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], cov.dtype).at[2].set(d))
    R = U @ D @ Vt
    varP = jnp.sum(wn * jnp.sum(Pc * Pc, axis=-1))
    s = jnp.sum(S * jnp.diag(D)) / jnp.maximum(varP, 1e-12)
    t = muQ - s * (R @ muP)
    return lie.sim3(R, t, s)


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def umeyama_ransac(P: jax.Array, Q: jax.Array, valid: jax.Array,
                   key: jax.Array, inlier_th: float = 0.05,
                   n_hyp: int = 256):
    """RANSAC Sim(3) from 3D-3D correspondences; all hypotheses batched.

    inlier_th: relative 3D error threshold (fraction of point depth).
    Returns (S_best (4,4), inlier mask (N,), n_inliers)."""
    N = P.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1e-9)
    picks = jax.random.categorical(
        key, jnp.log(probs + 1e-12)[None, :].repeat(n_hyp * 3, 0)).reshape(n_hyp, 3)

    def one(pk):
        w3 = jnp.ones(3, jnp.float32)
        return umeyama_sim3(P[pk], Q[pk], w3)

    Ss = jax.vmap(one)(picks)                              # (H,4,4)
    Ph = jnp.concatenate([P, jnp.ones((N, 1), P.dtype)], axis=1)
    Qp = jnp.einsum("hij,nj->hni", Ss, Ph)[..., :3]
    err = jnp.linalg.norm(Qp - Q[None], axis=-1)
    scale_ref = jnp.maximum(jnp.linalg.norm(Q, axis=-1), 0.5)
    inl = (err < inlier_th * scale_ref[None, :]) & valid[None, :]
    counts = inl.sum(axis=1)
    best = jnp.argmax(counts)
    S0 = Ss[best]
    mask = inl[best]
    # polish on all inliers
    S1 = umeyama_sim3(P, Q, mask.astype(jnp.float32))
    Qp1 = (Ph @ S1.T)[..., :3]
    err1 = jnp.linalg.norm(Qp1 - Q, axis=-1)
    mask1 = (err1 < inlier_th * scale_ref) & valid
    better = mask1.sum() >= mask.sum()
    S_out = jnp.where(better, S1, S0)
    m_out = jnp.where(better, mask1, mask)
    return S_out, m_out, m_out.sum()


def _huber_w(r2, delta):
    r = jnp.sqrt(r2 + 1e-12)
    return jnp.where(r < delta, 1.0, delta / r)


@functools.partial(jax.jit, static_argnames=("iterations", "fxycxy"))
def refine_sim3(S_init: jax.Array,
                P_cand: jax.Array, uv_cur: jax.Array, m2d: jax.Array,
                P3_cand: jax.Array, P3_cur: jax.Array, m3d: jax.Array,
                fxycxy, iterations: int = 20,
                huber_px: float = 3.0, huber_3d: float = 0.1):
    """GN over S (cand -> cur) with the reference's two residual types:
      * 2D: project S * P_cand into the current image vs uv_cur
        (EdgeProjectPoseOnlySim3, PR.h)
      * 3D: S * P3_cand vs P3_cur (EdgePointSim3)
    Returns (S, H (7,7) Gauss-Newton information)."""
    fx, fy, cx, cy = fxycxy

    def residuals(delta, S):
        Sd = lie.sim3_exp(delta) @ S
        Pc = P_cand @ Sd[:3, :3].T + Sd[:3, 3]
        z = jnp.maximum(Pc[:, 2], 1e-6)
        u = fx * Pc[:, 0] / z + cx
        v = fy * Pc[:, 1] / z + cy
        r2d = jnp.stack([u, v], -1) - uv_cur               # (N,2)
        Q = P3_cand @ Sd[:3, :3].T + Sd[:3, 3]
        r3d = Q - P3_cur                                    # (M,3)
        return r2d, r3d

    def gn(_, S):
        def f(delta):
            r2d, r3d = residuals(delta, S)
            return jnp.concatenate([r2d.reshape(-1), r3d.reshape(-1)])

        r = f(jnp.zeros(7, S.dtype))
        J = jax.jacfwd(f)(jnp.zeros(7, S.dtype))
        r2d_n = r[:2 * uv_cur.shape[0]].reshape(-1, 2)
        r3d_n = r[2 * uv_cur.shape[0]:].reshape(-1, 3)
        w2 = _huber_w(jnp.sum(r2d_n ** 2, -1), huber_px) * m2d
        w3 = _huber_w(jnp.sum(r3d_n ** 2, -1), huber_3d) * m3d
        w = jnp.concatenate([jnp.repeat(w2, 2), jnp.repeat(w3, 3)])
        H = (J * w[:, None]).T @ J
        b = (J * w[:, None]).T @ r
        delta = -jnp.linalg.solve(H + 1e-6 * jnp.eye(7, dtype=S.dtype), b)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        return (lie.sim3_exp(delta) @ S).astype(S_init.dtype)

    S = jax.lax.fori_loop(0, iterations, gn, S_init)

    # final information matrix at the solution
    def f(delta):
        r2d, r3d = residuals(delta, S)
        return jnp.concatenate([r2d.reshape(-1), r3d.reshape(-1)])

    r = f(jnp.zeros(7, S.dtype))
    J = jax.jacfwd(f)(jnp.zeros(7, S.dtype))
    r2d_n = r[:2 * uv_cur.shape[0]].reshape(-1, 2)
    r3d_n = r[2 * uv_cur.shape[0]:].reshape(-1, 3)
    w2 = _huber_w(jnp.sum(r2d_n ** 2, -1), huber_px) * m2d
    w3 = _huber_w(jnp.sum(r3d_n ** 2, -1), huber_3d) * m3d
    w = jnp.concatenate([jnp.repeat(w2, 2), jnp.repeat(w3, 3)])
    H = (J * w[:, None]).T @ J
    # inlier masks at the solution (LoopClosing.cc inlier gating)
    inl2d = (jnp.sum(r2d_n ** 2, -1) < huber_px ** 2 * 4) & (m2d > 0)
    inl3d = (jnp.sum(r3d_n ** 2, -1) < huber_3d ** 2 * 4) & (m3d > 0)
    return S, H, inl2d, inl3d
