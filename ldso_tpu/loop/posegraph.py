"""Sim(3) pose-graph optimization in pure JAX.

Replaces the vendored g2o stack the reference uses for loop closing
(src/Map.cc:75-165 runPoseGraphOptimization; custom types in
src/internal/PR.h: VertexSim3 with left-multiplicative Sim3::exp update,
EdgeSim3 with error e = log(Z^-1 * S_i * S_j^-1)).

Where g2o builds a sparse block system with numeric Jacobians on 1 CPU
thread, here every edge residual AND its two 7x7 Jacobian blocks come from
one vmapped jacfwd and the Gauss-Newton loop runs as `lax.fori_loop` on
device. Two solver paths share that linearization:

* dense (`optimize_pose_graph`): the (7N)^2 system is assembled by
  scatter-adds and solved exactly. Memory is 49 N^2 * 4 bytes — ~0.4 GB at
  KITTI-00 scale (1400 KFs), ~5 GB at 5k KFs; fast and exact up to a few
  thousand vertices.
* matrix-free PCG (`optimize_pose_graph_cg`): never forms H. Each
  conjugate-gradient step applies H edge-wise (gather x at the two
  endpoints, apply the cached 7x7 blocks, scatter-add) with a block-Jacobi
  preconditioner, O(49 E + 7 N) memory — the TPU analogue of g2o's sparse
  CSparse/CHOLMOD backend (Map.cc:83-88 BlockSolver_7_3), scaling to
  arbitrarily long trajectories.

`run_pose_graph` picks the dense path below `_DENSE_MAX_VERTICES` padded
vertices and PCG above it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ldso_tpu.math import lie


def _edge_residual(Si, Sj, Z_inv):
    """e = log(Z^-1 * S_i * S_j^-1)  (PR.h:151-179, EdgeSim3)."""
    return lie.sim3_log(Z_inv @ Si @ lie.sim3_inv(Sj))


def _edge_res_jac(Si, Sj, Z_inv):
    """Residual + Jacobians wrt left-multiplied tangent increments of both
    vertices, evaluated at delta = 0 (g2o uses numeric Jacobians; jacfwd
    here is exact)."""

    def f(delta):
        di, dj = delta[:7], delta[7:]
        return _edge_residual(lie.sim3_exp(di) @ Si, lie.sim3_exp(dj) @ Sj,
                              Z_inv)

    e = _edge_residual(Si, Sj, Z_inv)
    J = jax.jacfwd(f)(jnp.zeros(14, Si.dtype))
    return e, J[:, :7], J[:, 7:]


@functools.partial(jax.jit, static_argnames=("iterations", "damping"))
def optimize_pose_graph(S_init: jax.Array, fixed: jax.Array,
                        e_i: jax.Array, e_j: jax.Array,
                        Z: jax.Array, info: jax.Array,
                        edge_valid: jax.Array,
                        iterations: int = 25, damping: float = 1e-6):
    """Gauss-Newton over Sim(3) vertices.

    S_init: (N,4,4); fixed: (N,) bool (the newest KF is fixed, Map.cc:110);
    e_i/e_j: (E,) int32 vertex ids; Z: (E,4,4) measurements S_i_j;
    info: (E,7,7); edge_valid: (E,) bool. Returns (N,4,4)."""
    N = S_init.shape[0]
    dtype = S_init.dtype
    Z_inv = lie.sim3_inv(Z)

    def gn_step(_, S):
        e, Ji, Jj = jax.vmap(_edge_res_jac)(S[e_i], S[e_j], Z_inv)
        w = edge_valid.astype(dtype)[:, None, None]
        info_w = info * w

        # block contributions
        Hii = jnp.einsum("eki,ekl,elj->eij", Ji, info_w, Ji)
        Hjj = jnp.einsum("eki,ekl,elj->eij", Jj, info_w, Jj)
        Hij = jnp.einsum("eki,ekl,elj->eij", Ji, info_w, Jj)
        bi = jnp.einsum("eki,ekl,el->ei", Ji, info_w, e)
        bj = jnp.einsum("eki,ekl,el->ei", Jj, info_w, e)

        Hb = jnp.zeros((N, N, 7, 7), dtype)
        Hb = Hb.at[e_i, e_i].add(Hii)
        Hb = Hb.at[e_j, e_j].add(Hjj)
        Hb = Hb.at[e_i, e_j].add(Hij)
        Hb = Hb.at[e_j, e_i].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((N, 7), dtype)
        b = b.at[e_i].add(bi)
        b = b.at[e_j].add(bj)

        H = Hb.transpose(0, 2, 1, 3).reshape(7 * N, 7 * N)
        bf = b.reshape(7 * N)

        # gauge handling: fixed vertices get identity rows/cols, zero rhs
        free = (~fixed).astype(dtype)
        fm = jnp.repeat(free, 7)
        H = H * fm[:, None] * fm[None, :]
        H = H + jnp.diag(jnp.where(fm > 0, damping, 1.0))
        # scale-balance the solve
        d = jnp.sqrt(jnp.abs(jnp.diag(H)) + 1e-8)
        di = 1.0 / d
        Hs = di[:, None] * H * di[None, :]
        bs = di * bf
        delta = -(di * jnp.linalg.solve(Hs, bs)).reshape(N, 7)
        delta = delta * free[:, None]
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        return lie.sim3_exp(delta) @ S

    return jax.lax.fori_loop(0, iterations, gn_step, S_init)


@functools.partial(jax.jit,
                   static_argnames=("iterations", "damping", "cg_iters"))
def optimize_pose_graph_cg(S_init: jax.Array, fixed: jax.Array,
                           e_i: jax.Array, e_j: jax.Array,
                           Z: jax.Array, info: jax.Array,
                           edge_valid: jax.Array,
                           iterations: int = 25, damping: float = 1e-6,
                           cg_iters: int = 100):
    """Same Gauss-Newton outer loop as `optimize_pose_graph`, but each
    linear solve is matrix-free preconditioned CG: H is applied edge-wise
    from the cached (E,7,7) blocks, never assembled. Block-Jacobi
    preconditioner from the (N,7,7) diagonal blocks. O(E) memory."""
    N = S_init.shape[0]
    dtype = S_init.dtype
    Z_inv = lie.sim3_inv(Z)
    free = (~fixed).astype(dtype)[:, None]          # (N,1)

    def gn_step(_, S):
        e, Ji, Jj = jax.vmap(_edge_res_jac)(S[e_i], S[e_j], Z_inv)
        w = edge_valid.astype(dtype)[:, None, None]
        info_w = info * w

        Hii = jnp.einsum("eki,ekl,elj->eij", Ji, info_w, Ji)
        Hjj = jnp.einsum("eki,ekl,elj->eij", Jj, info_w, Jj)
        Hij = jnp.einsum("eki,ekl,elj->eij", Ji, info_w, Jj)
        bi = jnp.einsum("eki,ekl,el->ei", Ji, info_w, e)
        bj = jnp.einsum("eki,ekl,el->ei", Jj, info_w, e)
        b = jnp.zeros((N, 7), dtype).at[e_i].add(bi).at[e_j].add(bj)
        b = -b * free

        # block diagonal (with damping) and its inverse = preconditioner
        D = jnp.zeros((N, 7, 7), dtype).at[e_i].add(Hii).at[e_j].add(Hjj)
        D = D + damping * jnp.eye(7, dtype=dtype)
        # fixed vertices: identity blocks so the inverse stays finite
        D = jnp.where(free[:, :, None] > 0, D, jnp.eye(7, dtype=dtype))
        Minv = jnp.linalg.inv(D)

        def hmul(x):
            """(N,7) -> (N,7): (H + damping I) x on the free subspace."""
            xm = x * free
            xi, xj = xm[e_i], xm[e_j]
            yi = jnp.einsum("eij,ej->ei", Hii, xi) \
                + jnp.einsum("eij,ej->ei", Hij, xj)
            yj = jnp.einsum("eji,ej->ei", Hij, xi) \
                + jnp.einsum("eij,ej->ei", Hjj, xj)
            y = jnp.zeros((N, 7), dtype).at[e_i].add(yi).at[e_j].add(yj)
            return (y + damping * xm) * free

        def pc(r):
            return jnp.einsum("nij,nj->ni", Minv, r) * free

        # standard PCG from x = 0
        r0 = b
        z0 = pc(r0)
        p0 = z0
        rz0 = jnp.vdot(r0, z0)

        def cg_body(_, st):
            x, r, p, rz = st
            Ap = hmul(p)
            pAp = jnp.vdot(p, Ap)
            alpha = jnp.where(pAp > 1e-20, rz / pAp, 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = pc(r)
            rz_new = jnp.vdot(r, z)
            beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
            p = z + beta * p
            return x, r, p, rz_new

        x0 = jnp.zeros((N, 7), dtype)
        delta, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (x0, r0, p0, rz0))
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0) * free
        return lie.sim3_exp(delta) @ S

    return jax.lax.fori_loop(0, iterations, gn_step, S_init)


def optimize_pose_graph_cg_sharded(S_init: jax.Array, fixed: jax.Array,
                                   e_i: jax.Array, e_j: jax.Array,
                                   Z: jax.Array, info: jax.Array,
                                   edge_valid: jax.Array, mesh,
                                   iterations: int = 25,
                                   damping: float = 1e-6,
                                   cg_iters: int = 100):
    """Matrix-free PCG pose graph sharded over a device mesh.

    The factor-parallel decomposition: EDGES shard across the mesh axis
    'e' (each device linearizes its edge slice and applies its H blocks),
    VERTICES replicate. Every edge-wise scatter into vertex space is
    followed by one `psum` over 'e' — the per-CG-step ICI collective —
    and the CG scalar recurrences run on the replicated (N,7) vectors,
    identically on every device. This is the SLAM analogue of gradient
    data-parallelism (factors <-> examples, psum <-> gradient
    all-reduce); g2o has no distributed mode to mirror (SURVEY.md §2.3).

    Edge count must be divisible by the mesh axis size (the host wrapper
    pads to a power of two, so any power-of-two mesh divides it)."""
    from functools import partial
    from jax.sharding import PartitionSpec as PSpec
    try:
        from jax import shard_map              # jax >= 0.8
    except ImportError:                        # pragma: no cover
        from jax.experimental.shard_map import shard_map

    N = S_init.shape[0]
    dtype = S_init.dtype
    free = (~fixed).astype(dtype)[:, None]

    @partial(shard_map, mesh=mesh,
             in_specs=(PSpec(), PSpec(), PSpec("e"), PSpec("e"),
                       PSpec("e"), PSpec("e"), PSpec("e")),
             out_specs=PSpec())
    def run(S0, free, e_i, e_j, Z, info, edge_valid):
        Z_inv = lie.sim3_inv(Z)

        def gn_step(_, S):
            e, Ji, Jj = jax.vmap(_edge_res_jac)(S[e_i], S[e_j], Z_inv)
            w = edge_valid.astype(dtype)[:, None, None]
            info_w = info * w

            Hii = jnp.einsum("eki,ekl,elj->eij", Ji, info_w, Ji)
            Hjj = jnp.einsum("eki,ekl,elj->eij", Jj, info_w, Jj)
            Hij = jnp.einsum("eki,ekl,elj->eij", Ji, info_w, Jj)
            bi = jnp.einsum("eki,ekl,el->ei", Ji, info_w, e)
            bj = jnp.einsum("eki,ekl,el->ei", Jj, info_w, e)
            b = jnp.zeros((N, 7), dtype).at[e_i].add(bi).at[e_j].add(bj)
            b = -jax.lax.psum(b, "e") * free

            D = jnp.zeros((N, 7, 7), dtype).at[e_i].add(Hii).at[e_j].add(Hjj)
            D = jax.lax.psum(D, "e") + damping * jnp.eye(7, dtype=dtype)
            D = jnp.where(free[:, :, None] > 0, D, jnp.eye(7, dtype=dtype))
            Minv = jnp.linalg.inv(D)

            def hmul(x):
                xm = x * free
                xi, xj = xm[e_i], xm[e_j]
                yi = jnp.einsum("eij,ej->ei", Hii, xi) \
                    + jnp.einsum("eij,ej->ei", Hij, xj)
                yj = jnp.einsum("eji,ej->ei", Hij, xi) \
                    + jnp.einsum("eij,ej->ei", Hjj, xj)
                y = jnp.zeros((N, 7), dtype).at[e_i].add(yi).at[e_j].add(yj)
                y = jax.lax.psum(y, "e")        # the per-step collective
                return (y + damping * xm) * free

            def pc(r):
                return jnp.einsum("nij,nj->ni", Minv, r) * free

            r0 = b
            z0 = pc(r0)
            p0 = z0
            rz0 = jnp.vdot(r0, z0)

            def cg_body(_, st):
                x, r, p, rz = st
                Ap = hmul(p)
                pAp = jnp.vdot(p, Ap)
                alpha = jnp.where(pAp > 1e-20, rz / pAp, 0.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = pc(r)
                rz_new = jnp.vdot(r, z)
                beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
                p = z + beta * p
                return x, r, p, rz_new

            x0 = jnp.zeros((N, 7), dtype)
            delta, _, _, _ = jax.lax.fori_loop(
                0, cg_iters, cg_body, (x0, r0, p0, rz0))
            delta = jnp.where(jnp.isfinite(delta), delta, 0.0) * free
            return lie.sim3_exp(delta) @ S

        return jax.lax.fori_loop(0, iterations, gn_step, S0)

    return run(S_init, free, e_i, e_j, Z, info, edge_valid)


_DENSE_MAX_VERTICES = 1024      # padded; above this run_pose_graph uses PCG


def _pow2(n: int, lo: int = 16) -> int:
    import math
    return max(lo, 1 << int(math.ceil(math.log2(max(n, 1)))))


def run_pose_graph(global_map, cfg=None, iterations: int = 25):
    """Host wrapper over the GlobalMap poseRel edges (Map.cc:75-165).
    Optimizes all keyframes' S_cw with the newest fixed; writes back.

    Vertex/edge counts are padded to power-of-two buckets so the jitted
    GN program compiles O(log N) times over a whole run."""
    import numpy as np

    kfs = global_map.get_all_kfs()
    if len(kfs) < 3:
        return
    id_to_idx = {kf.kf_id: k for k, kf in enumerate(kfs)}
    N = len(kfs)

    ei, ej, Zs, infos = [], [], [], []
    for kf in kfs:
        for other_id, (S_rel, info, is_loop) in kf.pose_rel.items():
            if other_id not in id_to_idx:
                continue
            ei.append(id_to_idx[kf.kf_id])
            ej.append(id_to_idx[other_id])
            Zs.append(S_rel)
            infos.append(info)
    if not ei:
        return
    E = len(ei)

    # pad vertices: extra identity vertices, all fixed
    Nb = _pow2(N)
    S = np.tile(np.eye(4), (Nb, 1, 1))
    S[:N] = np.stack([kf.get_S_cw() for kf in kfs])
    fixed = np.ones(Nb, bool)
    fixed[: N - 1] = False  # newest KF (index N-1) stays pinned (Map.cc:110)

    # pad edges: self-edges on a fixed dummy vertex, masked out
    Eb = _pow2(E)
    eip = np.zeros(Eb, np.int32)
    ejp = np.zeros(Eb, np.int32)
    Zp = np.tile(np.eye(4), (Eb, 1, 1))
    infop = np.tile(np.eye(7), (Eb, 1, 1))
    valid = np.zeros(Eb, bool)
    eip[:E] = ei
    ejp[:E] = ej
    Zp[:E] = np.stack(Zs)
    infop[:E] = np.stack(infos)
    valid[:E] = True
    eip[E:] = N - 1  # fixed vertex
    ejp[E:] = N - 1

    import jax as _jax
    devs = _jax.devices()
    if Nb <= _DENSE_MAX_VERTICES:
        solver = optimize_pose_graph
    elif len(devs) > 1 and Eb % len(devs) == 0:
        # big graph + a mesh: shard the edges, one psum per CG step
        from jax.sharding import Mesh
        solver = functools.partial(optimize_pose_graph_cg_sharded,
                                   mesh=Mesh(np.array(devs), ("e",)))
    else:
        solver = optimize_pose_graph_cg
    S_new = solver(
        jnp.asarray(S), jnp.asarray(fixed),
        jnp.asarray(eip), jnp.asarray(ejp),
        jnp.asarray(Zp), jnp.asarray(infop),
        jnp.asarray(valid), iterations=iterations)
    S_new = np.asarray(S_new)
    for k, kf in enumerate(kfs):
        kf.S_cw = S_new[k]
    global_map.latest_optimized_kf_id = kfs[-1].kf_id
