"""Batched RANSAC PnP (replaces cv::solvePnPRansac in LoopClosing.cc:217).

Minimal solver: 6-point DLT for the 3x4 projection matrix (one batched SVD
per hypothesis — TPU-friendly, unlike quartic-root P3P), orthonormalized to
SE(3), then pose-only GN refinement on the inliers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ldso_tpu.math import lie


def _dlt_pose(X: jax.Array, xn: jax.Array):
    """X: (6,3) world points, xn: (6,2) normalized image coords.
    Returns T (4,4) with xn ~ project(R X + t)."""
    def rows(Xi, xi):
        x, y = xi[0], xi[1]
        Xh = jnp.concatenate([Xi, jnp.ones(1, Xi.dtype)])
        z4 = jnp.zeros(4, Xi.dtype)
        r1 = jnp.concatenate([Xh, z4, -x * Xh])
        r2 = jnp.concatenate([z4, Xh, -y * Xh])
        return jnp.stack([r1, r2])

    A = jax.vmap(rows)(X, xn).reshape(-1, 12)
    _, _, Vt = jnp.linalg.svd(A)
    P = Vt[-1].reshape(3, 4)
    # fix sign: points must be in front
    Xh = jnp.concatenate([X, jnp.ones((X.shape[0], 1), X.dtype)], axis=1)
    depth = Xh @ P[2]
    P = P * jnp.sign(jnp.sum(jnp.sign(depth)) + 0.5)
    M = P[:, :3]
    # orthonormalize via SVD, recover scale
    U, S, Vt2 = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(U @ Vt2))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], M.dtype).at[2].set(d))
    R = U @ D @ Vt2
    scale = jnp.sum(S * jnp.diag(D)) / 3.0
    t = P[:, 3] / jnp.maximum(scale, 1e-12)
    return lie.se3(R, t)


@functools.partial(jax.jit, static_argnames=("n_hyp", "gn_iters"))
def pnp_ransac(X: jax.Array, uv: jax.Array, valid: jax.Array,
               fxycxy, key: jax.Array, inlier_px: float = 3.0,
               n_hyp: int = 256, gn_iters: int = 8):
    """X: (N,3) 3D points (candidate frame), uv: (N,2) pixels (current
    frame). Returns (T_cur_from_pts (4,4), inlier mask, n_inliers)."""
    fx, fy, cx, cy = fxycxy
    N = X.shape[0]
    xn = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)

    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1e-9)
    picks = jax.random.categorical(
        key, jnp.log(probs + 1e-12)[None, :].repeat(n_hyp * 6, 0)).reshape(n_hyp, 6)

    Ts = jax.vmap(lambda pk: _dlt_pose(X[pk], xn[pk]))(picks)

    def reproj_err(T):
        Pc = X @ T[:3, :3].T + T[:3, 3]
        z = Pc[:, 2]
        u = fx * Pc[:, 0] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z) + cx
        v = fy * Pc[:, 1] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z) + cy
        err = jnp.hypot(u - uv[:, 0], v - uv[:, 1])
        return jnp.where(z > 0, err, 1e9)

    errs = jax.vmap(reproj_err)(Ts)                       # (H,N)
    inl = (errs < inlier_px) & valid[None, :]
    counts = inl.sum(axis=1)
    best = jnp.argmax(counts)
    T = Ts[best]
    mask = inl[best]

    # pose-only GN on inliers
    def gn(_, T):
        def f(xi):
            Td = lie.se3_exp(xi) @ T
            Pc = X @ Td[:3, :3].T + Td[:3, 3]
            z = jnp.maximum(Pc[:, 2], 1e-6)
            u = fx * Pc[:, 0] / z + cx
            v = fy * Pc[:, 1] / z + cy
            return (jnp.stack([u, v], -1) - uv).reshape(-1)

        r = f(jnp.zeros(6, T.dtype))
        J = jax.jacfwd(f)(jnp.zeros(6, T.dtype))
        w = jnp.repeat(mask.astype(T.dtype), 2)
        H = (J * w[:, None]).T @ J
        b = (J * w[:, None]).T @ r
        xi = -jnp.linalg.solve(H + 1e-6 * jnp.eye(6, dtype=T.dtype), b)
        xi = jnp.where(jnp.isfinite(xi), xi, 0.0)
        return (lie.se3_exp(xi) @ T).astype(X.dtype)

    T = jax.lax.fori_loop(0, gn_iters, gn, T)
    err_f = reproj_err(T)
    mask_f = (err_f < inlier_px) & valid
    return T, mask_f, mask_f.sum()
