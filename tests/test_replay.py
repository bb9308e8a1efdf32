"""Multi-chip paths (parallel/replay.py) on the 8-device CPU mesh.

Validates the two scaling axes of SURVEY.md §5 against their single-device
oracles: (a) data-parallel batched tracking, (b) the point-sharded
window-Hessian accumulation reduced with one psum (the TPU-native
stitchDoubleMT, AccumulatedTopHessian.h:64-105)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ldso_tpu.backend import ba
from ldso_tpu.config import Config
from ldso_tpu.frontend import tracker
from ldso_tpu.math import lie
from ldso_tpu.ops.preprocess import make_pyramid
from ldso_tpu.parallel import replay
from ldso_tpu.synthetic import PlaneScene, default_calib

from tests.test_backend import CFG, _build_ef


def _mesh():
    devs = np.array(jax.devices())
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    return Mesh(devs, ("dp",))


class TestShardedBuildSystem:
    def test_matches_unsharded_oracle(self):
        """Point-sharded accumulation + psum == single-device build_system."""
        mesh = _mesh()
        ef, dIs, poses, idep0, calib, (w, h) = _build_ef(
            pose_noise=2e-3, idepth_noise=0.05, n_pts=64)
        from ldso_tpu.backend.energy_functional import _reset_oob
        W = _reset_oob(ef.W)
        W, _ = ba.linearize_all(W, dIs, CFG, w, h)
        W = ba.apply_res(W)

        HA, bA, HL, bL, Hsc, bsc, aux, delta, nres = [
            np.asarray(x, np.float64) if hasattr(x, "shape") else x
            for x in ba.build_system(W)]

        fn = replay.make_sharded_build_system(mesh)
        HAs, bAs, HLs, bLs, Hscs, bscs, nres_s = [
            np.asarray(x, np.float64) for x in fn(W)]

        scale = max(np.abs(HA).max(), 1.0)
        np.testing.assert_allclose(HAs, HA, atol=2e-4 * scale)
        np.testing.assert_allclose(bAs, bA, atol=2e-4 * max(np.abs(bA).max(), 1.0))
        np.testing.assert_allclose(HLs, HL, atol=2e-4 * max(np.abs(HL).max(), 1.0))
        np.testing.assert_allclose(bLs, bL, atol=2e-4 * max(np.abs(bL).max(), 1.0))
        np.testing.assert_allclose(Hscs, Hsc, atol=2e-4 * max(np.abs(Hsc).max(), 1.0))
        np.testing.assert_allclose(bscs, bsc, atol=2e-4 * max(np.abs(bsc).max(), 1.0))
        assert int(nres_s) == int(np.asarray(nres))


class TestBatchedTracker:
    def test_matches_single_sequence(self):
        """B sequences in lockstep through the vmapped kernel reproduce the
        per-sequence single-call results."""
        mesh = _mesh()
        B = len(mesh.devices.flatten())
        cfg = Config()
        calib = default_calib(160, 120)
        scene = PlaneScene(freq_hi=18.0, contrast=80.0)
        coarsest = calib.levels - 1

        img_ref, idep_ref = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
        pyr_ref = make_pyramid(img_ref, calib.levels)
        caps = cfg.tracker_caps[:calib.levels]
        ref = tracker.make_tracker_ref_from_idepth(
            idep_ref, pyr_ref, calib, caps, stride=2)

        refs = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), ref)
        Ts, pyrs = [], []
        for b in range(B):
            xi = np.array([0.02 + 0.002 * b, 0.004 * b, 0, 0, 0.002 * b, 0])
            T = np.asarray(lie.se3_exp(jnp.asarray(xi)), np.float64)
            img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
            Ts.append(T)
            pyrs.append(make_pyramid(img, calib.levels))
        pyr_b = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *pyrs)

        step = replay.make_batched_tracker(calib, cfg, coarsest)
        T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (B, 1, 1))
        aff0 = jnp.zeros((B, 2), jnp.float32)
        expo = jnp.ones((B,), jnp.float32)
        noab = jnp.full((B, calib.levels), 1e9, jnp.float32)
        batched = step(replay.shard_batch(refs, mesh),
                       replay.shard_batch(pyr_b, mesh),
                       replay.shard_batch(T0, mesh),
                       replay.shard_batch(aff0, mesh),
                       replay.shard_batch(expo, mesh),
                       replay.shard_batch(noab, mesh))
        Tb, affb, okb, resb, flowb = [np.asarray(x) for x in batched]

        for b in range(B):
            Tk, affk, okk, resk, _ = tracker.track_frame(
                ref, pyrs[b], T0[0], aff0[0], jnp.float32(1.0), noab[0],
                calib, cfg, coarsest)
            assert bool(okb[b]) == bool(np.asarray(okk))
            np.testing.assert_allclose(Tb[b], np.asarray(Tk), atol=1e-5)
            # tracked pose must match the ground-truth relative motion
            err = np.asarray(lie.se3_log(jnp.asarray(
                np.linalg.inv(np.asarray(Tb[b], np.float64)) @ Ts[b])))
            assert np.linalg.norm(err) < 2e-3, f"seq {b}: {err}"


class TestMultiHost:
    def test_global_mesh_single_process(self):
        """Single process degenerates to a (1, n_local) mesh; sequence-axis
        sharding over both axes compiles and runs a psum'd program whose
        collective rides only the local (ICI-analogue) axis."""
        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh")
        mesh = replay.global_replay_mesh()
        assert mesh.axis_names == ("seq", "dp")
        assert mesh.devices.shape == (1, len(jax.devices()))

        B = 2 * len(jax.devices())
        x = np.arange(B * 16, dtype=np.float32).reshape(B, 16)
        xs = replay.shard_sequences_global(x, mesh)

        from jax.sharding import NamedSharding, PartitionSpec as P

        @jax.jit
        def step(a):
            return a * 2.0 + 1.0

        out = np.asarray(step(xs))
        np.testing.assert_allclose(out, x * 2.0 + 1.0)

        # a dp-axis psum (the sharded-BA reduction) under the global mesh
        def reduce_fn(a):
            return jax.lax.psum(jnp.sum(a), "dp")

        total = jax.jit(jax.shard_map(
            reduce_fn, mesh=mesh, in_specs=P(("seq", "dp")),
            out_specs=P(), check_vma=False))(xs)
        np.testing.assert_allclose(float(np.asarray(total)), x.sum(),
                                   rtol=1e-6)

    def test_global_mesh_groups_by_process(self):
        """Device grouping uses process_index, not jax.devices() order."""

        class FakeDev:
            def __init__(self, pid, did):
                self.process_index = pid
                self.id = did

            def __repr__(self):
                return f"d{self.process_index}.{self.id}"

        # interleaved order: grouping must still produce (2, 3)
        devs = [FakeDev(p, i) for i in range(3) for p in (0, 1)]
        mesh = replay.global_replay_mesh(devices=devs)
        assert mesh.devices.shape == (2, 3)
        assert all(d.process_index == 0 for d in mesh.devices[0])
        assert all(d.process_index == 1 for d in mesh.devices[1])

        with pytest.raises(ValueError):
            replay.global_replay_mesh(devices=devs + [FakeDev(0, 9)])

    def test_initialize_multihost_noop_without_env(self, monkeypatch):
        for k in ("LDSO_TPU_COORDINATOR", "JAX_COORDINATOR_ADDRESS"):
            monkeypatch.delenv(k, raising=False)
        assert replay.initialize_multihost() is False

    @pytest.mark.slow
    def test_two_process_cpu_dryrun(self):
        """Two actual processes form a jax.distributed cluster on the CPU
        backend and run the REAL batched coarse-tracking program over the
        (2, 4) global mesh, each process asserting its shards against the
        single-device oracle and ground truth (tests/mh_slam_dryrun.py).
        Skips when the backend build lacks cross-process CPU support."""
        import os
        import subprocess
        import sys

        script = os.path.join(os.path.dirname(__file__), "mh_slam_dryrun.py")
        env = dict(**os.environ)
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        procs = [subprocess.Popen([sys.executable, script, str(p), "18733"],
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT, env=env)
                 for p in range(2)]
        try:
            outs = [p.communicate(timeout=420)[0].decode() for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.skip("2-process CPU cluster rendezvous timed out here")
        if any(p.returncode != 0 for p in procs):
            joined = "\n".join(outs)
            if ("UNIMPLEMENTED" in joined or "not supported" in joined
                    or "collectives" in joined):
                pytest.skip(f"CPU backend lacks multi-process support: "
                            f"{joined[-300:]}")
            pytest.fail(joined[-2000:])
        assert all("MH_SLAM_OK" in o for o in outs)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
