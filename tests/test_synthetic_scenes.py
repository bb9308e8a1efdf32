"""BoxScene (second synthetic family): geometry sanity + tracking on a
scene with depth discontinuities and occlusion (VERDICT r3 #8)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import Config
from ldso_tpu.frontend import tracker
from ldso_tpu.math import lie
from ldso_tpu.ops.preprocess import make_pyramid
from ldso_tpu.synthetic import BoxScene, make_scene, default_calib

CFG = Config(tracker_caps=(8192, 4096, 2048, 1024, 512, 256))


def test_box_scene_has_depth_discontinuities():
    calib = default_calib(160, 120)
    scene = BoxScene()
    img, idep = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
    idep = np.asarray(idep)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 255
    # several distinct depth plateaus (background + boxes)
    levels = np.unique(np.round(1.0 / np.clip(idep, 1e-6, None), 2))
    assert len(levels) >= 4, f"expected multi-depth scene, got {levels}"
    # discontinuities: strong idepth gradients exist
    gy, gx = np.gradient(idep)
    assert np.max(np.abs(gx)) > 0.05

    # occlusion changes with viewpoint: a lateral move must change the
    # visibility mask of the nearest plateau
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.4
    _, idep2 = scene.render(calib, jnp.asarray(T))
    near = idep > (1.0 / scene.z_lo) * 0.95
    near2 = np.asarray(idep2) > (1.0 / scene.z_lo) * 0.95
    assert near.sum() > 0
    assert (near ^ near2).sum() > 0.01 * near.size


def test_make_scene_factory():
    assert isinstance(make_scene("boxes", freq_hi=25.0, contrast=80.0,
                                 n_waves=32), BoxScene)
    with pytest.raises(ValueError):
        make_scene("nope")


def test_tracking_on_boxes():
    """Coarse tracking recovers a small motion on the multi-depth scene
    (warps across depth discontinuities; occluded points must be rejected
    by the photometric gates, not corrupt the solve)."""
    calib = default_calib(160, 120)
    scene = BoxScene(contrast=80.0)
    img0, id0 = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
    pyr0 = make_pyramid(img0, calib.levels)
    ref = tracker.make_tracker_ref_from_idepth(
        id0, pyr0, calib, CFG.tracker_caps[:calib.levels], stride=2)
    xi = jnp.array([0.015, -0.008, 0.004, 0.002, 0.004, -0.001], jnp.float32)
    T_true = lie.se3_exp(xi)
    img1, _ = scene.render(calib, T_true)
    pyr1 = make_pyramid(img1, calib.levels)
    min_abort = jnp.full((calib.levels,), 1e9, jnp.float32)
    T, aff, ok, res, flow = tracker.track_frame(
        ref, pyr1, jnp.eye(4, dtype=jnp.float32), jnp.zeros(2, jnp.float32),
        jnp.float32(1.0), min_abort, calib, CFG, calib.levels - 1)
    assert bool(ok)
    err = np.asarray(lie.se3_log(jnp.asarray(
        np.linalg.inv(np.asarray(T_true, np.float64))
        @ np.asarray(T, np.float64))))
    # looser than the PlaneScene bound (2e-3): occluded points violate
    # brightness constancy and are only soft-rejected by the Huber/cutoff
    # gates — the reference behaves the same on depth edges
    assert np.linalg.norm(err) < 8e-3, f"pose error {err}"


@pytest.mark.slow
def test_vo_e2e_on_boxes():
    """Full-pipeline VO on the multi-depth scene (VERDICT r4 #3): the
    end-to-end path exercises what the tracker-level test above cannot —
    immature-point tracing across depth discontinuities (epipolar lines
    crossing occlusion edges hit the OOB/OUTLIER statuses of
    ImmaturePoint::traceOn, ImmaturePoint.cc:47-310), candidate selection
    at depth edges, and activation/BA with a multi-modal idepth
    distribution."""
    from ldso_tpu.system.full_system import FullSystem

    cfg = Config(max_points=1024, max_immature=1024,
                 tracker_caps=(8192, 4096, 2048, 1024, 512, 256),
                 desired_point_density=500, desired_immature_density=400)
    calib = default_calib(256, 192)
    scene = BoxScene(contrast=80.0, freq_hi=25.0)
    N = 40
    poses = []
    for i in range(N):
        # mostly-lateral path: maximizes parallax -> occlusion changes
        t = np.array([0.03 * i, 0.010 * np.sin(0.2 * i), 0.002 * i])
        w = np.array([0.0, 0.0015 * i, 0.0004 * i])
        T_wc = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([t, w]))))
        poses.append(np.linalg.inv(T_wc))

    fs = FullSystem(calib, cfg)
    for i, T in enumerate(poses):
        img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
        fs.add_active_frame(np.asarray(img), i, 1.0, i * 0.05)
        assert not fs.is_lost, f"lost at frame {i}"
        assert not fs.init_failed, f"init failed at frame {i}"

    assert fs.initialized
    est_ids = [f.id for f in fs.all_frames if f.pose_valid]
    assert len(est_ids) >= 0.6 * N
    _, est = fs.trajectory()
    gt = [poses[i] for i in est_ids]
    est_c = np.stack([np.linalg.inv(T)[:3, 3] for T in est])
    gt_c = np.stack([np.linalg.inv(T)[:3, 3] for T in gt])
    ec, gc = est_c - est_c.mean(0), gt_c - gt_c.mean(0)
    s = np.sqrt((gc ** 2).sum() / max((ec ** 2).sum(), 1e-12))
    U, _, Vt = np.linalg.svd(ec.T @ gc)
    R = (U @ Vt).T
    ate = float(np.sqrt(np.mean(np.sum((gc - s * (ec @ R.T)) ** 2, 1))))
    # looser than the plane-scene e2e bound (5 mm): occlusion edges feed
    # brightness-constancy violations into every stage
    assert ate < 0.02, f"ATE {ate*1000:.2f} mm too high on boxes"

    # the reconstruction must actually be multi-depth: active window
    # points should span the box depths (1.8-3.2 m) AND the background
    # (4.5 m), i.e. max/min idepth ratio well above a single plateau
    W = fs.ef.W
    valid = np.asarray(W.pt_valid)
    assert valid.sum() > 100
    idep = np.asarray(W.idepth)[valid]
    idep = idep[idep > 1e-6]
    lo, hi = np.percentile(idep, 5), np.percentile(idep, 95)
    assert hi / max(lo, 1e-9) > 1.5, (
        f"idepth spread [{lo:.3f}, {hi:.3f}] looks single-plane")


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
