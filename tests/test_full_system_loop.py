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
                     enable_loop_closing=True, loop_kf_gap=4)
        calib = default_calib(256, 192)
        scene = PlaneScene(freq_hi=30.0, contrast=80.0, n_waves=32)
        poses = _out_and_back(40)

        fs = FullSystem(calib, cfg)
        for i, T in enumerate(poses):
            img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
            fs.add_active_frame(np.asarray(img), i, 1.0, i * 0.05)
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


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
