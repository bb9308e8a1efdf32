"""Subprocess driver for the 2-process jax.distributed SLAM dryrun
(tests/test_replay.py::TestMultiHost::test_two_process_cpu_dryrun).

Each process owns 4 virtual CPU devices; together they form the (2, 4)
global replay mesh (seq axis = DCN / processes, dp axis = local devices).
The REAL batched coarse-tracking program (parallel/replay.py
make_batched_tracker — the production per-sequence kernel, not a toy
elementwise op) runs over 8 sequences sharded across both axes, and each
process checks its addressable shards against the in-process
single-device oracle: the same pose, and the ground-truth motion.

Usage: python mh_slam_dryrun.py <process_id> <coordinator_port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from ldso_tpu.config import Config  # noqa: E402
from ldso_tpu.frontend import tracker  # noqa: E402
from ldso_tpu.math import lie  # noqa: E402
from ldso_tpu.ops.preprocess import make_pyramid  # noqa: E402
from ldso_tpu.parallel import replay  # noqa: E402
from ldso_tpu.synthetic import PlaneScene, default_calib  # noqa: E402


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    ok = replay.initialize_multihost(f"127.0.0.1:{port}", 2, pid)
    assert ok
    assert jax.process_count() == 2
    mesh = replay.global_replay_mesh()
    assert mesh.devices.shape == (2, 4), mesh.devices.shape

    B, per_proc = 8, 4
    cfg = dataclasses.replace(
        Config(), tracker_caps=(1024, 512, 256, 128, 64, 32))
    calib = default_calib(128, 96)
    scene = PlaneScene(freq_hi=18.0, contrast=80.0)
    coarsest = calib.levels - 1

    img_ref, idep_ref = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
    pyr_ref = make_pyramid(img_ref, calib.levels)
    ref = tracker.make_tracker_ref_from_idepth(
        idep_ref, pyr_ref, calib, cfg.tracker_caps[:calib.levels], stride=2)

    # every process renders the full deterministic batch, then supplies
    # only its local shard — the multi-controller SPMD contract
    Ts_true, pyrs = [], []
    for b in range(B):
        xi = np.array([0.015 + 0.002 * b, 0.003 * b, 0.0,
                       0.0, 0.0015 * b, 0.0])
        T = np.asarray(lie.se3_exp(jnp.asarray(xi)), np.float64)
        img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
        Ts_true.append(T)
        pyrs.append(make_pyramid(img, calib.levels))

    def batch_np(tree_list):
        return jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *tree_list)

    pyr_b = batch_np(pyrs)
    ref_b = jax.tree_util.tree_map(
        lambda x: np.broadcast_to(np.asarray(x)[None],
                                  (B,) + np.asarray(x).shape), ref)
    T0 = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
    aff0 = np.zeros((B, 2), np.float32)
    expo = np.ones((B,), np.float32)
    noab = np.full((B, calib.levels), 1e9, np.float32)

    def shard(x):
        sharding = NamedSharding(mesh, P(("seq", "dp")))
        return jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(
                x[pid * per_proc:(pid + 1) * per_proc]))

    args = jax.tree_util.tree_map(
        shard, (ref_b, pyr_b, T0, aff0, expo, noab))

    step = replay.make_batched_tracker(calib, cfg, coarsest)
    Tb, affb, okb, resb, flowb = step(*args)

    # assemble this process's local rows of the global result
    T_local = np.zeros((per_proc, 4, 4), np.float64)
    ok_local = np.zeros((per_proc,), bool)
    for s in Tb.addressable_shards:
        lo = s.index[0].start or 0
        T_local[lo - pid * per_proc:lo - pid * per_proc
                + s.data.shape[0]] = np.asarray(s.data)
    for s in okb.addressable_shards:
        lo = s.index[0].start or 0
        ok_local[lo - pid * per_proc:lo - pid * per_proc
                 + s.data.shape[0]] = np.asarray(s.data)

    # oracle: the single-device kernel on this process's sequences
    for k in range(per_proc):
        b = pid * per_proc + k
        Tk, affk, okk, resk, _ = tracker.track_frame(
            ref, pyrs[b], jnp.asarray(T0[0]), jnp.asarray(aff0[0]),
            jnp.float32(1.0), jnp.asarray(noab[0]), calib, cfg, coarsest)
        assert bool(ok_local[k]) == bool(np.asarray(okk)), f"seq {b} ok"
        np.testing.assert_allclose(T_local[k], np.asarray(Tk, np.float64),
                                   atol=1e-5, err_msg=f"seq {b} pose")
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(T_local[k]) @ Ts_true[b])))
        assert np.linalg.norm(err) < 3e-3, f"seq {b} gt err {err}"

    print("MH_SLAM_OK", pid)


if __name__ == "__main__":
    main()
