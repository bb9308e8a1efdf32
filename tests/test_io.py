"""I/O layer tests: dataset readers, trajectory writers, ATE, CLI runner."""

import os
import subprocess
import sys
import zipfile

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.io import trajectory as traj
from ldso_tpu.math import lie
from ldso_tpu.synthetic import PlaneScene, default_calib

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_dataset(tmp_path, n=12, w=160, h=120, zipped=False):
    """Render a synthetic sequence to disk in TUM monoVO layout."""
    calib = default_calib(w, h)
    scene = PlaneScene(freq_hi=25.0, contrast=80.0)
    seq = tmp_path / "sequence_01"
    img_dir = seq / "images"
    img_dir.mkdir(parents=True)
    poses = []
    for i in range(n):
        t = np.array([0.05 * i, 0.01 * i, 0.0, 0, 0, 0])
        T = np.linalg.inv(np.asarray(lie.se3_exp(jnp.asarray(t))))
        poses.append(T)
        img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
        arr = np.asarray(img).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:05d}.png")
    with open(seq / "times.txt", "w") as f:
        for i in range(n):
            f.write(f"{i:05d} {i * 0.05:.6f} 0.02\n")
    with open(seq / "camera.txt", "w") as f:
        fx = 0.55 * w / w
        f.write(f"{0.55:.6f} {0.55 * w / h:.6f} "
                f"{(w - 1) / 2 / w:.6f} {(h - 1) / 2 / h:.6f} 0\n")
        f.write(f"{w} {h}\nnone\n{w} {h}\n")
    files = str(img_dir)
    if zipped:
        zpath = seq / "images.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            for p in sorted(img_dir.iterdir()):
                z.write(p, arcname=f"images/{p.name}")
        files = str(zpath)
    return seq, files, poses, calib


class TestReaders:
    def test_tum_folder(self, tmp_path):
        from ldso_tpu.io.datasets import ImageFolderReader
        seq, files, poses, calib = _write_dataset(tmp_path)
        r = ImageFolderReader(files, str(seq / "camera.txt"))
        assert r.num_images() == 12
        assert len(r.timestamps) == 12
        assert r.exposures and abs(r.exposures[0] - 0.02) < 1e-6
        img, expo, ts = r.get_image(3)
        assert img.shape == (120, 160)
        assert abs(ts - 0.15) < 1e-9

    def test_tum_zip(self, tmp_path):
        from ldso_tpu.io.datasets import ImageFolderReader
        seq, files, poses, calib = _write_dataset(tmp_path, zipped=True)
        r = ImageFolderReader(files, str(seq / "camera.txt"))
        assert r.num_images() == 12
        img, _, _ = r.get_image(0)
        assert img.shape == (120, 160)

    def test_kitti_layout(self, tmp_path):
        from ldso_tpu.io.datasets import ImageFolderReader
        seq = tmp_path / "00"
        (seq / "image_0").mkdir(parents=True)
        arr = (np.random.RandomState(0).rand(120, 160) * 255).astype(np.uint8)
        for i in range(4):
            Image.fromarray(arr).save(seq / "image_0" / f"{i:06d}.png")
        with open(seq / "times.txt", "w") as f:
            for i in range(4):
                f.write(f"{i * 0.1:.6f}\n")
        with open(seq / "camera.txt", "w") as f:
            f.write("0.5 0.6 0.5 0.5 0\n160 120\nnone\n160 120\n")
        r = ImageFolderReader(str(seq), str(seq / "camera.txt"),
                              dataset_type="kitti")
        assert r.num_images() == 4
        img, expo, ts = r.get_image(2)
        assert abs(ts - 0.2) < 1e-9


class TestTrajectory:
    def test_tum_roundtrip(self, tmp_path):
        poses = [np.asarray(lie.se3_exp(jnp.asarray(
            np.random.RandomState(i).randn(6) * 0.2))) for i in range(5)]
        ts = [0.1 * i for i in range(5)]
        fn = str(tmp_path / "traj.txt")
        traj.write_tum(fn, ts, poses)
        ts2, poses_wc = traj.read_tum(fn)
        np.testing.assert_allclose(ts2, ts, atol=1e-12)
        for T_cw, T_wc in zip(poses, poses_wc):
            np.testing.assert_allclose(T_wc, np.linalg.inv(T_cw), atol=1e-9)

    def test_ate_zero_on_identical(self):
        poses = [np.asarray(lie.se3_exp(jnp.asarray(
            np.random.RandomState(i).randn(6) * 0.3))) for i in range(8)]
        assert traj.ate_rmse(poses, poses) < 1e-9

    def test_ate_scale_invariant(self):
        poses = [np.asarray(lie.se3_exp(jnp.asarray(
            [0.2 * i, 0.05 * i, 0, 0, 0, 0]))) for i in range(8)]
        scaled = []
        for T in poses:
            T2 = T.copy()
            T2[:3, 3] *= 3.0
            scaled.append(T2)
        assert traj.ate_rmse(scaled, poses, with_scale=True) < 1e-9
        assert traj.ate_rmse(scaled, poses, with_scale=False) > 0.1

    def test_ply(self, tmp_path):
        pts = np.random.rand(10, 3)
        fn = str(tmp_path / "cloud.ply")
        traj.save_ply(fn, pts)
        txt = open(fn).read()
        assert "element vertex 10" in txt


@pytest.mark.slow
class TestCLI:
    @pytest.mark.slow
    def test_run_dso_kitti_end_to_end(self, tmp_path):
        """Drive the KITTI CLI runner (mode=1, KITTI output format) on a
        synthetic sequence laid out KITTI-style."""
        calib = default_calib(192, 120)
        scene = PlaneScene(freq_hi=25.0, contrast=80.0)
        seq = tmp_path / "00"
        (seq / "image_0").mkdir(parents=True)
        poses = []
        for i in range(14):
            t = np.array([0.05 * i, 0.01 * i, 0.0, 0, 0, 0])
            T = np.linalg.inv(np.asarray(lie.se3_exp(jnp.asarray(t))))
            poses.append(T)
            img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
            Image.fromarray(np.asarray(img).astype(np.uint8)).save(
                seq / "image_0" / f"{i:06d}.png")
        with open(seq / "times.txt", "w") as f:
            for i in range(14):
                f.write(f"{i * 0.1:.6f}\n")
        with open(seq / "camera.txt", "w") as f:
            f.write(f"0.55 {0.55 * 192 / 120:.6f} {95.5 / 192:.6f} "
                    f"{59.5 / 120:.6f} 0\n192 120\nnone\n192 120\n")
        out = str(tmp_path / "res_kitti.txt")
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
        res = subprocess.run(
            [sys.executable, "/root/repo/examples/run_dso_kitti.py",
             f"files={seq}", f"calib={seq/'camera.txt'}", "preset=3",
             "loopclosing=0", f"output={out}"],
            capture_output=True, text=True, timeout=900, env=env)
        assert res.returncode == 0, res.stderr[-3000:]
        assert os.path.exists(out) and os.path.exists(out + ".noloop")
        # KITTI format: one 'id r00 ... tz' line per keyframe
        rows = [l.split() for l in open(out) if l.strip()]
        assert len(rows) >= 3 and all(len(r) == 13 for r in rows)
        M = np.array([float(x) for x in rows[-1][1:]]).reshape(3, 4)
        # rotation block must be orthonormal
        np.testing.assert_allclose(M[:3, :3] @ M[:3, :3].T, np.eye(3),
                                   atol=1e-4)

    def test_run_dso_euroc_end_to_end(self, tmp_path):
        """Drive the EuRoC CLI runner on a synthetic sequence laid out
        EuRoC-style (cam0/data/*.png + data.csv; DatasetReader.h:254-283)."""
        calib = default_calib(192, 120)
        scene = PlaneScene(freq_hi=25.0, contrast=80.0)
        cam0 = tmp_path / "mav0" / "cam0"
        (cam0 / "data").mkdir(parents=True)
        rows = []
        for i in range(14):
            t = np.array([0.05 * i, 0.01 * i, 0.0, 0, 0, 0])
            T = np.linalg.inv(np.asarray(lie.se3_exp(jnp.asarray(t))))
            img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
            name = f"{1403636579763555584 + i * 50000000}.png"
            Image.fromarray(np.asarray(img).astype(np.uint8)).save(
                cam0 / "data" / name)
            rows.append(f"{1403636579763555584 + i * 50000000},{name}")
        with open(cam0 / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n" + "\n".join(rows) + "\n")
        with open(tmp_path / "camera.txt", "w") as f:
            f.write(f"0.55 {0.55 * 192 / 120:.6f} {95.5 / 192:.6f} "
                    f"{59.5 / 120:.6f} 0\n192 120\nnone\n192 120\n")
        out = str(tmp_path / "res_euroc.txt")
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
        res = subprocess.run(
            [sys.executable, "/root/repo/examples/run_dso_euroc.py",
             f"files={cam0}", f"calib={tmp_path/'camera.txt'}", "preset=3",
             "loopclosing=0", f"output={out}"],
            capture_output=True, text=True, timeout=900, env=env)
        assert res.returncode == 0, res.stderr[-3000:]
        assert os.path.exists(out) and os.path.exists(out + ".noloop")
        ts, poses_wc = traj.read_tum(out)
        assert len(poses_wc) >= 3

    def test_run_dso_tum_mono_end_to_end(self, tmp_path):
        """Drive the actual CLI entry point on an on-disk synthetic dataset;
        the written trajectory must track ground truth."""
        seq, files, poses, calib = _write_dataset(tmp_path, n=14, w=192, h=120)
        out = str(tmp_path / "results.txt")
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH="/root/repo")
        cmd = [sys.executable, "/root/repo/examples/run_dso_tum_mono.py",
               f"files={files}", f"calib={seq/'camera.txt'}",
               "preset=3", "loopclosing=0", f"output={out}"]
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                             env=env)
        assert res.returncode == 0, res.stderr[-3000:]
        assert os.path.exists(out), res.stdout[-3000:]
        assert os.path.exists(out + ".noloop")
        ts, poses_wc = traj.read_tum(out)
        assert len(poses_wc) >= 3
        # keyframe trajectory vs ground truth (match by timestamp)
        gt = {round(i * 0.05, 6): poses[i] for i in range(len(poses))}
        est_cw = [np.linalg.inv(T) for T in poses_wc]
        gt_cw = [gt[round(t, 6)] for t in ts]
        ate = traj.ate_rmse(est_cw, gt_cw)
        assert ate < 0.01, f"CLI run ATE {ate}"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestViz:
    def test_plot_trajectory(self, tmp_path):
        from ldso_tpu import viz
        from ldso_tpu.slam_map import FrameShell, GlobalMap, MapPointRecord
        gm = GlobalMap()
        for k in range(5):
            T = np.eye(4)
            T[0, 3] = -0.3 * k
            kf = FrameShell(id=k, kf_id=k, T_cw=T)
            kf.map_points.append(MapPointRecord(k, 0.1, 0.1, 0.4))
            gm.add_keyframe(kf)
        out = str(tmp_path / "traj.png")
        viz.plot_trajectory(gm, out)
        assert os.path.getsize(out) > 1000
