"""End-to-end synthetic visual odometry (pure-DSO slice; BASELINE config[0]
analogue on synthetic data — no real datasets ship in this container)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import Config
from ldso_tpu.math import lie
from ldso_tpu.synthetic import PlaneScene, default_calib
from ldso_tpu.system.full_system import FullSystem


def sim_align_ate(est_poses, gt_poses):
    """Umeyama similarity alignment -> RMSE of camera centers."""
    est_c = np.stack([np.linalg.inv(T)[:3, 3] for T in est_poses])
    gt_c = np.stack([np.linalg.inv(T)[:3, 3] for T in gt_poses])
    mu_e, mu_g = est_c.mean(0), gt_c.mean(0)
    ec, gc = est_c - mu_e, gt_c - mu_g
    s = np.sqrt((gc ** 2).sum() / max((ec ** 2).sum(), 1e-12))
    U, _, Vt = np.linalg.svd(ec.T @ gc)
    R = (U @ Vt).T
    return float(np.sqrt(np.mean(np.sum((gc - s * (ec @ R.T)) ** 2, 1)))), s


def _make_sequence(n, calib, scene):
    poses = []
    for i in range(n):
        t = np.array([0.035 * i, 0.012 * np.sin(0.2 * i), 0.004 * i])
        w = np.array([0.0, 0.002 * i, 0.0005 * i])
        T_wc = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([t, w]))))
        poses.append(np.linalg.inv(T_wc))
    return poses


class TestFullSystemVO:
    def test_synthetic_sequence(self):
        cfg = Config(max_points=1024, max_immature=1024,
                     tracker_caps=(8192, 4096, 2048, 1024, 512, 256),
                     desired_point_density=500, desired_immature_density=400)
        calib = default_calib(256, 192)
        scene = PlaneScene(freq_hi=25.0, contrast=80.0)
        N = 48     # long enough to overflow the window -> frame/point
        poses = _make_sequence(N, calib, scene)   # marginalization happens

        fs = FullSystem(calib, cfg)
        for i, T in enumerate(poses):
            img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
            fs.add_active_frame(np.asarray(img), i, 1.0, i * 0.05)
            assert not fs.is_lost, f"lost at frame {i}"
            assert not fs.init_failed, f"init failed at frame {i}"

        assert fs.initialized, "never initialized"
        est_ids = [f.id for f in fs.all_frames if f.pose_valid]
        assert len(est_ids) >= 0.6 * N
        _, est = fs.trajectory()
        gt = [poses[i] for i in est_ids]
        ate, scale = sim_align_ate(est, gt)
        assert ate < 0.005, f"ATE {ate*1000:.2f} mm too high"
        # the synthetic plane sits at 3 m with unit-mean initializer idepth
        assert 2.0 < scale < 4.5, f"recovered scale {scale}"

        # window invariants
        assert len(fs.window_frames) <= cfg.max_frames
        n_active = int(fs.ef.W.pt_valid.sum())
        assert 100 < n_active <= cfg.max_points
        # map accumulates retired points
        n_retired = sum(len(kf.map_points) for kf in
                        fs.global_map.get_all_kfs())
        assert n_retired > 0
        # shutdown flush retires the still-active window points too
        fs.flush_active_points()
        pc = fs.global_map.point_cloud()
        assert len(pc) >= n_retired + 100
        assert np.isfinite(pc).all()

    def test_keyframe_trajectory_subset(self):
        cfg = Config(max_points=512, max_immature=512,
                     tracker_caps=(4096, 2048, 1024, 512, 256, 128),
                     desired_point_density=300, desired_immature_density=250)
        calib = default_calib(192, 144)
        scene = PlaneScene(freq_hi=25.0, contrast=80.0)
        poses = _make_sequence(16, calib, scene)
        fs = FullSystem(calib, cfg)
        for i, T in enumerate(poses):
            img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
            fs.add_active_frame(np.asarray(img), i, 1.0, i * 0.05)
            if fs.is_lost or fs.init_failed:
                pytest.skip("small-image run unstable; covered by the larger test")
        ts_all, all_p = fs.trajectory()
        ts_kf, kf_p = fs.trajectory(keyframes_only=True)
        assert 0 < len(kf_p) < len(all_p)
        assert fs.global_map.num_frames() == len(kf_p)

    def test_retry_sweep_recovers_pose(self):
        """Force the retrack gate (an impossibly good last RMSE) and check
        the rank-then-refine sweep still lands on an accurate pose."""
        from ldso_tpu.slam_map import FrameShell
        cfg = Config(max_points=1024, max_immature=1024,
                     tracker_caps=(8192, 4096, 2048, 1024, 512, 256),
                     desired_point_density=500, desired_immature_density=400)
        calib = default_calib(256, 192)
        scene = PlaneScene(freq_hi=25.0, contrast=80.0)
        N = 20
        poses = _make_sequence(N + 1, calib, scene)
        fs = FullSystem(calib, cfg)
        for i in range(N):
            img, _ = scene.render(calib, jnp.asarray(poses[i], jnp.float32))
            fs.add_active_frame(np.asarray(img), i, 1.0, i * 0.05)
            assert not fs.is_lost and not fs.init_failed
        img, _ = scene.render(calib, jnp.asarray(poses[N], jnp.float32))
        fs.last_coarse_rmse = np.full_like(
            np.asarray(fs.last_coarse_rmse, np.float64), 1e-9)
        sweeps0 = getattr(fs, "_n_retry_sweeps", 0)
        sh = FrameShell(id=N, timestamp=N * 0.05, exposure=1.0)
        fs.all_frames.append(sh)
        ok = fs._track_new_coarse(sh, np.asarray(img), commit_trace=False,
                                  neighbors=(fs.all_frames[-2],
                                             fs.all_frames[-3]))
        assert ok
        assert getattr(fs, "_n_retry_sweeps", 0) == sweeps0 + 1
        # the swept pose must agree with the constant-velocity prediction
        # in the system's own (mono, scale-ambiguous) frame: this easy
        # trajectory is near-constant-velocity, so the residual motion
        # should be a small fraction of one frame's motion
        slast, sprelast = fs.all_frames[-2], fs.all_frames[-3]
        M = slast.T_cw @ np.linalg.inv(sprelast.T_cw)
        T_pred = M @ slast.T_cw
        from ldso_tpu.math import lie_np
        resid = np.linalg.norm(lie_np.se3_log(
            np.linalg.inv(T_pred) @ sh.T_cw))
        step = np.linalg.norm(lie_np.se3_log(M))
        assert resid < 0.5 * step + 0.01, (
            f"swept pose {resid:.4f} vs frame step {step:.4f}")


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
