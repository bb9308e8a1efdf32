"""Async pipeline + map checkpoint tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import Config
from ldso_tpu.math import lie
from ldso_tpu.slam_map import FrameShell, GlobalMap, MapPointRecord
from ldso_tpu.synthetic import PlaneScene, default_calib
from ldso_tpu.system.full_system import FullSystem
from ldso_tpu.system.pipeline import AsyncPipeline


class TestCheckpoint:
    def test_map_save_load_roundtrip(self, tmp_path):
        gm = GlobalMap()
        rng = np.random.RandomState(0)
        for k in range(4):
            T = np.asarray(lie.se3_exp(jnp.asarray(rng.randn(6) * 0.2)))
            kf = FrameShell(id=k * 3, kf_id=k, timestamp=0.1 * k, T_cw=T)
            kf.feat_uv = rng.rand(7, 2).astype(np.float32) * 100
            kf.feat_desc = rng.randint(0, 2 ** 32, (7, 8), dtype=np.uint32)
            kf.feat_idepth = rng.rand(7).astype(np.float32)
            kf.map_points.append(MapPointRecord(k, 0.1, 0.2, 0.5))
            if k > 0:
                kf.add_pose_rel(k - 1, np.asarray(
                    lie.sim3_exp(jnp.asarray(rng.randn(7) * 0.1))),
                    np.eye(7) * 2.0, is_loop=(k == 3))
            gm.add_keyframe(kf)
        gm.latest_optimized_kf_id = 3
        path = str(tmp_path / "map.npz")
        gm.save(path)
        gm2 = GlobalMap.load(path)
        assert gm2.num_frames() == 4
        assert gm2.latest_optimized_kf_id == 3
        for k in range(4):
            a, b = gm.keyframes[k], gm2.keyframes[k]
            np.testing.assert_allclose(b.T_cw, a.T_cw, atol=1e-12)
            np.testing.assert_array_equal(b.feat_desc, a.feat_desc)
            assert len(b.map_points) == 1
            assert abs(b.map_points[0].idepth - 0.5) < 1e-9
            assert set(b.pose_rel) == set(a.pose_rel)
            for o in a.pose_rel:
                np.testing.assert_allclose(b.pose_rel[o][0],
                                           a.pose_rel[o][0], atol=1e-12)
                assert b.pose_rel[o][2] == a.pose_rel[o][2]


@pytest.mark.slow
class TestAsyncPipeline:
    def test_async_matches_sync_quality(self):
        cfg = Config(max_points=512, max_immature=512,
                     tracker_caps=(4096, 2048, 1024, 512, 256, 128),
                     desired_point_density=300, desired_immature_density=250,
                     enable_loop_closing=False)
        calib = default_calib(192, 144)
        scene = PlaneScene(freq_hi=25.0, contrast=80.0)
        poses = []
        for i in range(20):
            t = np.array([0.035 * i, 0.01 * np.sin(0.2 * i), 0.003 * i,
                          0.0, 0.0015 * i, 0.0])
            poses.append(np.linalg.inv(np.asarray(lie.se3_exp(jnp.asarray(t)))))

        fs = FullSystem(calib, cfg)
        pipe = AsyncPipeline(fs, linearize_operation=False)
        for i, T in enumerate(poses):
            img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
            # uint8 frames: the production upload format (4x fewer bytes
            # over the link; also exercises the staged ingest batching)
            u8 = np.clip(np.round(np.asarray(img)), 0, 255).astype(np.uint8)
            pipe.add_active_frame(u8, i, 1.0, i * 0.05)
            assert not fs.is_lost
        pipe.block_until_mapping_is_finished()
        assert not pipe._ingest, "staged frames must flush on shutdown"
        assert fs.initialized
        assert fs.global_map.num_frames() >= 3

        from ldso_tpu.io.trajectory import ate_rmse
        est_ids = [f.id for f in fs.all_frames if f.pose_valid]
        _, est = fs.trajectory()
        gt = [poses[i] for i in est_ids]
        ate = ate_rmse(est, gt)
        assert ate < 0.01, f"async ATE {ate}"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


@pytest.mark.slow
class TestDeterministicPipeline:
    def _run(self, scene, calib, cfg, poses, images):
        from ldso_tpu.system.pipeline import DeterministicPipeline
        fs = FullSystem(calib, cfg)
        pipe = DeterministicPipeline(fs, depth=3)
        for i in range(len(images)):
            pipe.add_active_frame(images[i], i, 1.0, i * 0.05)
            if fs.is_lost:
                break
        pipe.block_until_mapping_is_finished()
        kf_ids = [k.id for k in fs.global_map.get_all_kfs()]
        traj = {f.id: f.T_cw.copy() for f in fs.all_frames if f.pose_valid}
        return kf_ids, traj, fs

    def test_deterministic_and_matches_sync_quality(self):
        """Two lookahead runs are IDENTICAL (the determinism contract of
        linearizeOperation mode), and the trajectory matches the strict
        per-frame sync loop's quality."""
        cfg = Config(max_points=512, max_immature=512,
                     tracker_caps=(4096, 2048, 1024, 512, 256, 128),
                     desired_point_density=300, desired_immature_density=250,
                     enable_loop_closing=False)
        calib = default_calib(192, 144)
        scene = PlaneScene(freq_hi=25.0, contrast=80.0)
        poses, images = [], []
        for i in range(18):
            t = np.array([0.035 * i, 0.01 * np.sin(0.2 * i), 0.003 * i,
                          0.0, 0.0015 * i, 0.0])
            T = np.linalg.inv(np.asarray(lie.se3_exp(jnp.asarray(t))))
            poses.append(T)
            img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
            images.append(np.clip(np.round(np.asarray(img)), 0,
                                  255).astype(np.uint8))

        kf1, traj1, fs1 = self._run(scene, calib, cfg, poses, images)
        kf2, traj2, fs2 = self._run(scene, calib, cfg, poses, images)
        assert kf1 == kf2
        assert set(traj1) == set(traj2)
        for i in traj1:
            np.testing.assert_array_equal(traj1[i], traj2[i])

        # strict sync oracle for quality
        fs = FullSystem(calib, cfg)
        for i in range(len(images)):
            fs.add_active_frame(images[i], i, 1.0, i * 0.05)
        from ldso_tpu.io.trajectory import ate_rmse
        est_ids = [f.id for f in fs1.all_frames if f.pose_valid]
        est = [fs1.all_frames[i].T_cw for i in range(len(est_ids))]
        gt = [poses[i] for i in est_ids]
        ate = ate_rmse([traj1[i] for i in sorted(traj1)],
                       [poses[i] for i in sorted(traj1)])
        ate_sync = ate_rmse([f.T_cw for f in fs.all_frames if f.pose_valid],
                            [poses[f.id] for f in fs.all_frames
                             if f.pose_valid])
        assert ate < max(0.01, 3.0 * ate_sync + 1e-4), \
            f"lookahead ATE {ate} vs sync {ate_sync}"


class TestTrackChain:
    def test_chain_prep_matches_host_hypothesis(self):
        """_chain_prep's device constant-velocity hypothesis equals the
        host _motion_hypotheses tries[0] (FullSystem.cc:189-206)."""
        from ldso_tpu.system.full_system import (TrackChain, _chain_prep,
                                                 _motion_hypotheses)
        rng = np.random.RandomState(3)
        T_ref = np.asarray(lie.se3_exp(jnp.asarray(rng.randn(6) * 0.1)))
        T_slast = np.asarray(lie.se3_exp(jnp.asarray(rng.randn(6) * 0.1)))
        T_sprelast = np.asarray(lie.se3_exp(jnp.asarray(rng.randn(6) * 0.1)))
        chain = TrackChain(jnp.asarray(T_slast, jnp.float32),
                           jnp.asarray(T_sprelast, jnp.float32),
                           jnp.asarray([0.1, -0.2], jnp.float32),
                           jnp.full((6,), 2.5, jnp.float32))
        T0, aff0, rmse = _chain_prep(chain, jnp.asarray(T_ref, jnp.float32))
        lastF_2_slast = T_slast @ np.linalg.inv(T_ref)
        slast_2_sprelast = T_sprelast @ np.linalg.inv(T_slast)
        tries = _motion_hypotheses(lastF_2_slast, slast_2_sprelast)
        np.testing.assert_allclose(np.asarray(T0), tries[0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(aff0), [0.1, -0.2], atol=1e-7)
        np.testing.assert_allclose(np.asarray(rmse), 2.5, atol=1e-7)

    def test_chain_update_advances_and_falls_back(self):
        """_chain_update takes the tracked pose when ok, the predicted pose
        (T0 @ T_ref) when tracking failed, like trackNewCoarse's fallback
        (FullSystem.cc:355-365)."""
        from ldso_tpu.system.full_system import TrackChain, _chain_update
        L = 6
        T_ref = np.asarray(lie.se3_exp(jnp.asarray([0.1, 0, 0, 0, 0, 0.02])))
        T = np.asarray(lie.se3_exp(jnp.asarray([0.02, 0, 0, 0, 0.01, 0])))
        T0 = np.asarray(lie.se3_exp(jnp.asarray([0.5, 0, 0, 0, 0, 0])))
        chain = TrackChain(jnp.eye(4), jnp.eye(4),
                           jnp.zeros(2), jnp.full((L,), 3.0, jnp.float32))
        res = np.full(L, 1.5, np.float32)

        def packed(ok):
            return jnp.asarray(np.concatenate(
                [T.reshape(-1), [0.3, -0.1], [1.0 if ok else 0.0, 1.0],
                 res, np.zeros(3)]), jnp.float32)

        c_ok = _chain_update(chain, packed(True), jnp.asarray(T0, jnp.float32),
                             jnp.asarray(T_ref, jnp.float32))
        np.testing.assert_allclose(np.asarray(c_ok.T_slast), T @ T_ref,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_ok.aff), [0.3, -0.1],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(c_ok.rmse), 1.5, atol=1e-6)

        c_bad = _chain_update(chain, packed(False),
                              jnp.asarray(T0, jnp.float32),
                              jnp.asarray(T_ref, jnp.float32))
        np.testing.assert_allclose(np.asarray(c_bad.T_slast), T0 @ T_ref,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_bad.aff), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(c_bad.rmse), 3.0, atol=1e-6)


class TestChainBatch:
    def test_batched_chain_matches_sequential(self):
        """_frame_step_chain_batch (one fused dispatch per ingest batch)
        produces the same packed results and final chain state as B
        sequential _frame_step_chain dispatches."""
        import jax
        from ldso_tpu.frontend import tracker
        from ldso_tpu.ops.preprocess import make_pyramid
        from ldso_tpu.system.full_system import (
            TrackChain, _chain_prep, _chain_update, _frame_step_chain,
            _frame_step_chain_batch)

        calib = default_calib(192, 144)
        scene = PlaneScene(freq_hi=25.0, contrast=80.0)
        cfg = Config()
        img0, id0 = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
        pyr0 = make_pyramid(img0, calib.levels)
        ref = tracker.make_tracker_ref_from_idepth(
            id0, pyr0, calib, cfg.tracker_caps[:calib.levels], stride=2)

        B = 4
        images = []
        for b in range(1, B + 1):
            T = lie.se3_exp(jnp.asarray(
                [0.01 * b, -0.004 * b, 0.002 * b, 0.001 * b, 0.002 * b, 0.0],
                jnp.float32))
            img, _ = scene.render(calib, T)
            images.append(np.clip(np.round(np.asarray(img)), 0,
                                  255).astype(np.uint8))
        T_ref = jnp.eye(4, dtype=jnp.float32)
        L = calib.levels
        chain0 = TrackChain(T_ref, T_ref, jnp.zeros(2, jnp.float32),
                            jnp.full((L,), jnp.inf, jnp.float32))
        expos = jnp.ones((B,), jnp.float32)

        # sequential oracle: B chain dispatches
        chain = chain0
        seq_packed = []
        for b in range(B):
            T0, aff0, rmse = _chain_prep(chain, T_ref)
            pyr, packed = _frame_step_chain(
                jnp.asarray(images[b]), ref, T0, aff0, expos[b], rmse,
                None, calib, cfg, L - 1)
            chain = _chain_update(chain, packed, T0, T_ref)
            seq_packed.append(np.asarray(packed))

        pyrs, packed_all, chain_b = _frame_step_chain_batch(
            jnp.asarray(np.stack(images)), ref, chain0, T_ref, expos,
            None, calib, cfg, L - 1)
        packed_all = np.asarray(packed_all)
        for b in range(B):
            np.testing.assert_allclose(packed_all[b], seq_packed[b],
                                       rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(chain_b.T_slast),
                                   np.asarray(chain.T_slast), atol=2e-5)
        # the stacked pyramids slice to the per-frame pyramid
        pyr_last = jax.tree_util.tree_map(lambda x: x[B - 1], pyrs)
        pyr_ref = make_pyramid(jnp.asarray(images[B - 1]), calib.levels)
        np.testing.assert_allclose(np.asarray(pyr_last.dI[0]),
                                   np.asarray(pyr_ref.dI[0]), atol=1e-5)
