"""Fault-injection robustness: the pipeline survives the reference's
benchmark perturbations (benchmark_varNoise / benchmark_varBlurNoise,
Setting.cc:95-101, applied inside undistortion, Undistort.cc:372-470).

The perturbation ops themselves are unit-tested here too; the e2e test
feeds a moderately warped+blurred synthetic sequence through the full
track -> keyframe -> BA pipeline and asserts it neither diverges nor
loses tracking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import Config
from ldso_tpu.math import lie
from ldso_tpu.ops.perturb import benchmark_perturb
from ldso_tpu.synthetic import PlaneScene, default_calib
from ldso_tpu.system.full_system import FullSystem

from test_full_system import _make_sequence, sim_align_ate


class TestPerturbOps:
    # warp_noise / blur_noise op behavior is covered in
    # test_determinism.py::TestPerturb; here only the combined entry point.
    def test_zero_amplitude_is_identity(self):
        img = jnp.asarray(np.random.RandomState(0).rand(64, 96) * 255,
                          jnp.float32)
        out = benchmark_perturb(img, jax.random.PRNGKey(1), 0.0, 0.0)
        assert out is img   # host-level gate: no program dispatched

    def test_both_stages_compose(self):
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(64, 96) * 255, jnp.float32)
        out = np.asarray(benchmark_perturb(img, jax.random.PRNGKey(2),
                                           var_noise=1.5, var_blur=1.0))
        assert out.shape == (64, 96)
        assert np.isfinite(out).all()
        assert not np.allclose(out, np.asarray(img))


class TestPerturbedPipeline:
    def test_pipeline_survives_moderate_perturbation(self):
        """VERDICT r2 #6: one robustness test through the full system."""
        cfg = Config(max_points=1024, max_immature=1024,
                     tracker_caps=(8192, 4096, 2048, 1024, 512, 256),
                     desired_point_density=500, desired_immature_density=400)
        calib = default_calib(256, 192)
        scene = PlaneScene(freq_hi=25.0, contrast=80.0)
        N = 32
        poses = _make_sequence(N, calib, scene)

        fs = FullSystem(calib, cfg)
        for i, T in enumerate(poses):
            img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
            # moderate: 0.75 px warp field + sigma <= 0.8 variable blur
            img = benchmark_perturb(img, jax.random.PRNGKey(i),
                                    var_noise=0.75, var_blur=0.8)
            fs.add_active_frame(np.asarray(img), i, 1.0, i * 0.05)
            assert not fs.is_lost, f"lost at frame {i} under perturbation"
            assert not fs.init_failed, f"init failed at frame {i}"

        assert fs.initialized
        est_ids = [f.id for f in fs.all_frames if f.pose_valid]
        assert len(est_ids) >= 0.6 * N
        _, est = fs.trajectory()
        gt = [poses[i] for i in est_ids]
        ate, _ = sim_align_ate(est, gt)
        # loose gate: perturbed tracking stays metrically sane (clean-run
        # gate is 5 mm in test_full_system)
        assert ate < 0.05, f"perturbed ATE {ate*1000:.2f} mm too high"


class TestReaderWiring:
    def test_reader_applies_perturbation(self, tmp_path):
        """noise=/blur= reach ImageFolderReader.get_image (CLI wiring)."""
        from PIL import Image
        from ldso_tpu.io.datasets import ImageFolderReader

        rng = np.random.RandomState(3)
        img_dir = tmp_path / "images"
        img_dir.mkdir()
        frame = (rng.rand(48, 64) * 255).astype(np.uint8)
        Image.fromarray(frame).save(img_dir / "00000.png")
        calib = tmp_path / "camera.txt"
        calib.write_text("Pinhole 60 60 32 24 0\n64 48\nnone\n64 48\n")

        r = ImageFolderReader(str(img_dir), str(calib), dataset_type="tum")
        clean, _, _ = r.get_image(0)
        r.var_noise = 1.5
        r.var_blur = 1.0
        dirty, _, _ = r.get_image(0)
        clean, dirty = np.asarray(clean), np.asarray(dirty)
        assert clean.shape == dirty.shape
        assert np.isfinite(dirty).all()
        assert not np.allclose(clean, dirty)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
