"""End-to-end VO with loop closing on a synthetic out-and-back trajectory
(BASELINE config[3] analogue: loop detection + Sim(3) PGO in the loop)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import Config
from ldso_tpu.math import lie
from ldso_tpu.synthetic import PlaneScene, default_calib
from ldso_tpu.system.full_system import FullSystem


def _out_and_back(n):
    """Drive right then return to the start (same heading throughout)."""
    xs = np.concatenate([np.linspace(0, 1.0, n // 2),
                         np.linspace(1.0, 0.0, n - n // 2)])
    poses = []
    for i, x in enumerate(xs):
        t = np.array([x, 0.03 * np.sin(0.3 * i), 0.0])
        T_wc = np.eye(4)
        T_wc[:3, 3] = t
        poses.append(np.linalg.inv(T_wc))
    return poses


@pytest.mark.slow
class TestLoopVO:
    def test_out_and_back_closes_loop(self):
        cfg = Config(max_points=1024, max_immature=1024,
                     tracker_caps=(8192, 4096, 2048, 1024, 512, 256),
                     desired_point_density=500, desired_immature_density=400,
                     enable_loop_closing=True, loop_kf_gap=4,
                     # mode=1 semantics: free affine (zeroed priors) so the
                     # exposure ramp below drives |log rel_a| eviction
                     affine_opt_mode_a=0.0, affine_opt_mode_b=0.0)
        calib = default_calib(256, 192)
        scene = PlaneScene(freq_hi=30.0, contrast=80.0, n_waves=32)
        n = 40
        poses = _out_and_back(n)
        # exposure ramp (darken out, recover back): keyframe 0 is EXEMPT
        # from distance-score marginalization (FullSystem.cc:699) and only
        # leaves the window via the |log affine| > 0.7 criterion — without
        # it the covisibility-range gate in DetectLoop blocks every
        # candidate (reference semantics; same reason tools/head_to_head
        # ramps brightness)
        half = n // 2
        ramp = np.concatenate([np.linspace(0.0, -0.9, half),
                               np.linspace(-0.9, 0.0, n - half)])
        gains = np.exp(ramp)

        fs = FullSystem(calib, cfg)
        for i, T in enumerate(poses):
            img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
            img = np.asarray(img) * float(gains[i])
            fs.add_active_frame(img, i, 1.0, i * 0.05)
            assert not fs.is_lost and not fs.init_failed, f"failed at {i}"

        assert fs.global_map.num_frames() >= 8
        lc = fs.loop_closing
        assert lc is not None and lc.vocab is not None, "vocabulary never trained"
        # at least one loop edge installed on the return leg
        loops = [(kf.kf_id, oid) for kf in fs.global_map.get_all_kfs()
                 for oid, (_, _, il) in kf.pose_rel.items() if il]
        assert lc.n_loops_closed >= 1, "no loop closed on revisit"
        assert loops, "loop edge missing from the pose graph"
        # PGO ran and stamped optimized poses
        assert fs.global_map.latest_optimized_kf_id >= 0
        for kf in fs.global_map.get_all_kfs():
            assert kf.S_cw is not None
            s = float(lie.sim3_scale(jnp.asarray(kf.get_S_cw())))
            assert 0.5 < s < 2.0

        # ---- loop closure must CORRECT accumulated drift (the reference's
        # results.txt vs results.txt.noloop contract, README.md:97-99;
        # run_dso_tum_mono.cc:432-433). The clean synthetic run drifts less
        # than the loop measurement noise, so inject monocular-style drift
        # into the stored poses and odometry edges. The live-path loop
        # edges (S_rel, Hessian info) are measured purely from per-KF
        # features + depths — pose-independent — so they stay valid, which
        # is exactly the drift model: local geometry good, global poses
        # drifted.
        kfs = fs.global_map.get_all_kfs()
        gt = {kf.id: poses[kf.id] for kf in kfs}
        orig = [kf.T_cw.copy() for kf in kfs]
        D7 = np.array([4e-3, -3e-3, 2e-3, 1e-3, -5e-4, 8e-4, 3e-3])
        D = np.asarray(lie.sim3_exp(jnp.asarray(D7)))
        drifted = [orig[0].copy()]
        for k in range(1, len(kfs)):
            rel = orig[k] @ np.linalg.inv(orig[k - 1])
            drifted.append(D @ rel @ drifted[-1])
        for k, kf in enumerate(kfs):
            kf.T_cw = drifted[k]
            kf.S_cw = drifted[k].copy()
            for oid in list(kf.pose_rel.keys()):
                S_rel, info, il = kf.pose_rel[oid]
                if il:
                    continue            # loop measurements stay as measured
                other = fs.global_map.keyframes[oid]
                kidx = next(i for i, K in enumerate(kfs)
                            if K.kf_id == other.kf_id)
                kf.pose_rel[oid] = (drifted[k] @ np.linalg.inv(drifted[kidx]),
                                    info, il)

        def ate(mats):
            est_c = np.stack([np.linalg.inv(T)[:3, 3] for T in mats])
            gt_c = np.stack([np.linalg.inv(gt[kf.id])[:3, 3] for kf in kfs])
            ec = est_c - est_c.mean(0)
            gc = gt_c - gt_c.mean(0)
            s = np.sqrt((gc ** 2).sum() / max((ec ** 2).sum(), 1e-12))
            U, _, Vt = np.linalg.svd(ec.T @ gc)
            R = (U @ Vt).T
            return float(np.sqrt(np.mean(
                np.sum((gc - s * (ec @ R.T)) ** 2, 1))))

        def loop_residual(get_pose):
            """Max Sim3 log-norm over loop edges: |log(Z^-1 Si Sj^-1)|."""
            r = 0.0
            for kf in kfs:
                for oid, (Z, _info, il) in kf.pose_rel.items():
                    if not il or oid not in fs.global_map.keyframes:
                        continue
                    other = fs.global_map.keyframes[oid]
                    e = lie.sim3_log(jnp.asarray(
                        np.linalg.inv(Z) @ get_pose(kf)
                        @ np.linalg.inv(get_pose(other))))
                    r = max(r, float(np.linalg.norm(np.asarray(e))))
            return r

        # monocular global scale: estimated translations live in the
        # estimator's internal units; relative poses are invariant to the
        # global sim-alignment, so the scale must be applied explicitly
        # before comparing against metric ground truth
        est_c0 = np.stack([np.linalg.inv(T)[:3, 3] for T in orig])
        gt_c0 = np.stack([np.linalg.inv(gt[kf.id])[:3, 3] for kf in kfs])
        ec0 = est_c0 - est_c0.mean(0)
        gc0 = gt_c0 - gt_c0.mean(0)
        s_glob = float(np.sqrt((gc0 ** 2).sum()
                               / max((ec0 ** 2).sum(), 1e-12)))

        def loop_pair_err_vs_gt(get_pose):
            """Max Sim3 log-norm of each loop PAIR's relative pose against
            ground truth — the geometry a loop edge constrains directly
            (independent of the edge's own measurement)."""
            r = 0.0
            for kf in kfs:
                for oid, (_Z, _info, il) in kf.pose_rel.items():
                    if not il or oid not in fs.global_map.keyframes:
                        continue
                    other = fs.global_map.keyframes[oid]
                    rel_est = get_pose(kf) @ np.linalg.inv(get_pose(other))
                    rel_est = rel_est.copy()
                    rel_est[:3, 3] *= s_glob
                    rel_gt = gt[kf.id] @ np.linalg.inv(gt[other.id])
                    e = lie.sim3_log(jnp.asarray(
                        np.linalg.inv(rel_gt) @ rel_est))
                    r = max(r, float(np.linalg.norm(np.asarray(e))))
            return r

        ate_odo = ate(drifted)
        assert ate_odo > 0.01, "drift injection too small to be meaningful"
        res_odo = loop_residual(lambda kf: kf.T_cw)
        pair_odo = loop_pair_err_vs_gt(lambda kf: kf.T_cw)
        from ldso_tpu.loop import posegraph
        posegraph.run_pose_graph(fs.global_map)
        ate_loop = ate([kf.get_S_cw() for kf in kfs])
        # The DECISIVE contracts are the directly-constrained quantities:
        # each loop pair's relative pose must return to ground truth (up
        # to the edge's own measurement error; observed ratio ~0.2) and
        # the loop-edge residuals must collapse.
        pair_loop = loop_pair_err_vs_gt(lambda kf: kf.get_S_cw())
        assert pair_loop < 0.3 * pair_odo, \
            (f"loop-pair geometry not corrected: {pair_loop:.4f} vs "
             f"{pair_odo:.4f} pre-PGO")
        res_loop = loop_residual(lambda kf: kf.get_S_cw())
        assert res_loop < 0.25 * res_odo, \
            (f"loop-edge residual not reduced: {res_loop:.4f} vs "
             f"{res_odo:.4f} pre-PGO")
        # Global sim-aligned ATE under SMOOTH injected drift is an
        # unstable score for a 2-anchor graph: the odometry edges agree
        # with the drifted poses by construction, so pinning two pairs
        # bows the chain and can score worse than the smoothly-drifted
        # baseline even though every constrained quantity improved. The
        # reference behaves the same on the revisit head-to-head (its 6
        # loop edges DEGRADE its ATE 1.11 -> 2.51 mm = 2.26x,
        # BASELINE.md r5). Gate: no blow-up (the r5 bogus-edge bug this
        # guards against scored 430x).
        assert ate_loop < 1.5 * ate_odo, \
            (f"PGO blew up the trajectory: ATE loop {ate_loop*1000:.1f}mm "
             f"vs odometry {ate_odo*1000:.1f}mm")


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
