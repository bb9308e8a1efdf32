"""Multi-chip scaling: batched sequence replay + sharded BA accumulation.

The reference is a single-process system; its only parallelism is a 6-worker
thread pool + SSE (SURVEY.md §2.3). The TPU build's scaling axes are:

  (a) data-parallel sequence replay — BASELINE.json configs[4] "KITTI 00-10
      replayed concurrently across TPU cores": each device runs the same
      jitted tracking/BA programs on its own sequence; realized by sharding
      the leading batch axis of every per-sequence buffer over the mesh.
  (b) residual-sharded window BA — the analogue of stitchDoubleMT's
      thread-split (AccumulatedTopHessian.h:64-105): each device accumulates
      the 13x13 pair blocks for its shard of the point pool, then one psum
      over ICI reduces the stitched (4+8F)^2 system.

Both compile against an abstract `jax.sharding.Mesh`, so the same code runs
on a v5e-8 ICI mesh or a CPU-device test mesh.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldso_tpu.config import Config
from ldso_tpu.camera.calib import Calibration
from ldso_tpu.backend import ba
from ldso_tpu.backend.window import Window
from ldso_tpu.frontend import tracker
from ldso_tpu.ops.preprocess import FramePyramid


# ---------------------------------------------------------------------------
# multi-host (DCN) scale-out
# ---------------------------------------------------------------------------

_distributed_initialized = False


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Env-guarded `jax.distributed.initialize` — the DCN leg of the scaling
    design (README "multi-host scale-out"): the *sequence* (replay batch)
    axis maps across hosts over DCN; within each host the point/pair-block
    axes ride the ICI mesh. The reference has no distributed runtime at all
    (SURVEY §2.3), so this is a blueprint axis, not reference parity.

    Reads LDSO_TPU_COORDINATOR / LDSO_TPU_NUM_PROCESSES /
    LDSO_TPU_PROCESS_ID when arguments are omitted (also accepts the
    standard JAX_COORDINATOR_ADDRESS set). Returns True when the
    distributed runtime was (or already is) initialized, False when no
    multi-host configuration is present — single-process callers fall
    through untouched.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    coord = coordinator_address or os.environ.get(
        "LDSO_TPU_COORDINATOR", os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coord is None:
        return False
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("LDSO_TPU_NUM_PROCESSES",
                       os.environ.get("JAX_NUM_PROCESSES", "0")))
    pid = process_id if process_id is not None else int(
        os.environ.get("LDSO_TPU_PROCESS_ID",
                       os.environ.get("JAX_PROCESS_ID", "0")))
    if nproc <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    _distributed_initialized = True
    return True


def global_replay_mesh(seq_axis: str = "seq", dp_axis: str = "dp",
                       devices=None) -> Mesh:
    """Global (hosts, devices-per-host) mesh: `seq_axis` spans processes
    (DCN — the batched-replay sequence axis needs no collectives, so it
    tolerates DCN latency), `dp_axis` spans each host's local chips (ICI —
    where make_sharded_build_system's psum rides).

    Single-process (tests, one v5e host) degenerates to (1, n_local); the
    same pjit'd programs run unchanged. Devices are grouped by their
    process index explicitly — jax.devices() ordering is not guaranteed to
    be process-contiguous."""
    devs = list(devices if devices is not None else jax.devices())
    by_proc: dict[int, list] = {}
    for d in devs:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    counts = {len(v) for v in by_proc.values()}
    if len(counts) != 1:
        raise ValueError(f"uneven devices per process: "
                         f"{ {k: len(v) for k, v in by_proc.items()} }")
    per_host = counts.pop()
    grid = np.array([by_proc[p] for p in sorted(by_proc)], dtype=object)
    return Mesh(grid.reshape(len(by_proc), per_host), (seq_axis, dp_axis))


def shard_sequences_global(tree, mesh: Mesh, seq_axis: str = "seq",
                           dp_axis: str = "dp"):
    """Shard a leading sequence-batch axis over BOTH mesh axes (hosts x
    local chips): pure data parallelism for replay, so the DCN dimension
    never appears inside a collective."""
    sharding = NamedSharding(mesh, P((seq_axis, dp_axis)))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


# ---------------------------------------------------------------------------
# (a) data-parallel batched replay
# ---------------------------------------------------------------------------

def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Place a pytree with a leading batch axis onto the mesh, sharded over
    `axis` and replicated elsewhere."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def make_batched_tracker(calib: Calibration, cfg: Config, coarsest: int):
    """Returns a jitted function tracking a BATCH of sequences in lockstep:
    (refs, pyrs, T_init, aff, exposure, min_abort) all carry a leading
    batch axis; under a mesh the batch is sharded over devices (pure data
    parallel — no collectives needed in the step itself)."""

    def step(ref: tracker.TrackerRef, pyr: FramePyramid, T_init, aff,
             exposure, min_abort):
        return tracker.track_frame(ref, pyr, T_init, aff, exposure,
                                   min_abort, calib, cfg, coarsest)

    return jax.jit(jax.vmap(step))


# ---------------------------------------------------------------------------
# (b) residual-sharded BA accumulation (psum over ICI)
# ---------------------------------------------------------------------------

def _shard_points(W: Window, n_shards: int, shard_idx):
    """Slice the point pool (and its residual lattice) into equal shards.
    P must be divisible by n_shards."""
    P_total = W.P
    sz = P_total // n_shards
    lo = shard_idx * sz

    def cut(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == P_total:
            return jax.lax.dynamic_slice_in_dim(x, lo, sz, axis=0)
        return x

    return W._replace(
        pt_valid=cut(W.pt_valid), pt_host=cut(W.pt_host),
        pt_u=cut(W.pt_u), pt_v=cut(W.pt_v),
        pt_color=cut(W.pt_color), pt_weights=cut(W.pt_weights),
        idepth=cut(W.idepth), idepth_zero=cut(W.idepth_zero),
        idepth_backup=cut(W.idepth_backup), pt_step=cut(W.pt_step),
        pt_prior=cut(W.pt_prior), pt_energy_th=cut(W.pt_energy_th),
        pt_num_good_res=cut(W.pt_num_good_res),
        pt_max_rel_baseline=cut(W.pt_max_rel_baseline),
        pt_idepth_hessian=cut(W.pt_idepth_hessian),
        res_exist=cut(W.res_exist), res_active=cut(W.res_active),
        res_linearized=cut(W.res_linearized), res_state=cut(W.res_state),
        res_energy=cut(W.res_energy), res_new_state=cut(W.res_new_state),
        res_new_energy=cut(W.res_new_energy),
        res_new_energy_wo=cut(W.res_new_energy_wo),
        res_toZero=cut(W.res_toZero), Jpdxi=cut(W.Jpdxi), Jpdc=cut(W.Jpdc),
        Jpdd=cut(W.Jpdd), JIdx=cut(W.JIdx), JabF=cut(W.JabF),
        resF=cut(W.resF), center_proj=cut(W.center_proj),
    )


def make_sharded_build_system(mesh: Mesh, axis: str = "dp"):
    """Point-sharded window-Hessian accumulation: each device stitches the
    system for its point shard; one `psum` over the ICI ring reduces the
    (4+8F)^2 blocks — the TPU-native stitchDoubleMT."""
    n = len(mesh.devices.flatten())

    def shard_fn(W: Window):
        idx = jax.lax.axis_index(axis)
        Ws = _shard_points(W, n, idx)
        pc = ba.make_precalc(Ws)
        accA, HddA, bdA, HcdA, nresA = ba._accumulate_top(Ws, pc, mode=0)
        accL, HddL, bdL, HcdL, _ = ba._accumulate_top(Ws, pc, mode=1)
        HA, bA = ba._stitch_top(accA, pc, Ws, use_prior=False)
        HL, bL = ba._stitch_top(accL, pc, Ws, use_prior=False)
        Hsc, bsc, _ = ba._accumulate_sc(Ws, pc, HddA + HddL, bdA + bdL,
                                        HcdA + HcdL, shift_prior=True)
        # one fused all-reduce over the ICI ring for all four systems
        Hs = jax.lax.psum(jnp.stack([HA, HL, Hsc]), axis)
        bs = jax.lax.psum(jnp.stack([bA, bL, bsc]), axis)
        nres = jax.lax.psum(nresA, axis)
        # priors enter once, post-reduction (replicated math, stays uniform)
        HLp, bLp = _add_priors(Hs[1], bs[1], W, pc)
        return Hs[0], bs[0], HLp, bLp, Hs[2], bs[2], nres

    def _add_priors(H, b, W, pc):
        from ldso_tpu.config import CPARS
        F = W.F
        delta_prior = (W.state - 0.0)[:, :8]
        pdiag = W.prior * W.frame_valid[:, None]
        H = H.at[jnp.arange(CPARS), jnp.arange(CPARS)].add(W.c_prior)
        b = b.at[:CPARS].add(W.c_prior * (W.c_value - W.c_zero))
        idx = CPARS + jnp.arange(8 * F)
        H = H.at[idx, idx].add(pdiag.reshape(-1))
        b = b.at[CPARS:].add((pdiag * delta_prior).reshape(-1))
        return H, b

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(),),            # window replicated; shards cut on-device
        out_specs=P(),
        check_vma=False))
