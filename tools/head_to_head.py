"""Head-to-head harness: reference LDSO (headless CPU build) vs ldso_tpu
on identical synthetic datasets — the BASELINE.md methodology, now
reproducible in-repo (VERDICT r2 #3 asked for a loop-closing head-to-head
on a trajectory that actually revisits).

Steps:
  1. render a synthetic sequence (straight VO, or out-and-back revisit)
     and write it as a TUM-mono-layout folder (PNGs + times.txt +
     camera.txt) plus ground-truth poses;
  2. write a .dbow3 vocabulary trained by ldso_tpu (the reference's own
     DBoW3 reader parsing it is a binary-format parity check);
  3. run the reference binary (tools/build_reference.sh output) and the
     ldso_tpu CLI on the same folder;
  4. report fps, keyframes, loops closed, and sim(3)-aligned ATE of
     results.txt (loop-closed) and results.txt.noloop for both.

Usage:
  python tools/head_to_head.py --traj straight|revisit \
      [--frames N] [--ref /tmp/refbuild/run_dso_tum_mono] [--skip-ours]
"""

import argparse
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def straight_poses(n):
    import jax.numpy as jnp
    from ldso_tpu.math import lie
    poses = []
    for i in range(n):
        t = np.array([0.03 * i, 0.01 * np.sin(0.2 * i), 0.004 * i])
        w = np.array([0.0, 0.0018 * i, 0.0004 * i])
        T_wc = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([t, w]))))
        poses.append(np.linalg.inv(T_wc))
    return poses


def revisit_poses(n):
    """Out-and-back with constant heading: the return leg re-observes the
    out leg's views, so both systems should detect loops once the revisit
    exceeds their kf-gap exclusion windows (reference kfGap=10,
    LoopClosing.cc:108-126)."""
    half = n // 2
    xs = np.concatenate([np.linspace(0.0, 0.03 * half, half),
                         np.linspace(0.03 * half, 0.0, n - half)])
    poses = []
    for i, x in enumerate(xs):
        T_wc = np.eye(4)
        T_wc[:3, 3] = np.array([x, 0.04 * np.sin(0.15 * i), 0.0])
        poses.append(np.linalg.inv(T_wc))
    return poses


def brightness_gain(traj, n):
    """Per-frame photometric gain. For the revisit trajectory a +-log-0.9
    triangle ramp (exposure sweep): keyframe 0 must leave the reference's
    window via the |log affine| > setting_maxLogAffFacInWindow=0.7
    criterion (Setting.cc:32) — it is EXEMPT from distance-score
    marginalization (frameID == 0, FullSystem.cc:699) and constant
    synthetic brightness never triggers the affine gate, which otherwise
    pins the fast-loop-closing covisibility window to [0, newest] and
    silently blocks every loop candidate (LoopClosing.cc:115-123). Real
    sequences have exposure variation; this reproduces it."""
    if traj != "revisit":
        return np.ones(n)
    half = n // 2
    # darken (never brighten): x2.5 gain would clip at 255 and destroy
    # texture; x0.4 keeps the signal linear at lower contrast
    ramp = np.concatenate([np.linspace(0.0, -0.9, half),
                           np.linspace(-0.9, 0.0, n - half)])
    return np.exp(ramp)


def write_dataset(out_dir, poses, w=640, h=480, gains=None,
                  scene_name="plane"):
    import jax.numpy as jnp
    from PIL import Image
    from ldso_tpu.synthetic import make_scene, default_calib

    calib = default_calib(w, h)
    scene = make_scene(scene_name, freq_hi=25.0, contrast=80.0, n_waves=32)
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    for i, T in enumerate(poses):
        img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
        if gains is not None:
            img = img * float(gains[i])
        arr = np.clip(np.round(np.asarray(img)), 0, 255).astype(np.uint8)
        # ".jpg" NAME with PNG CONTENT: the reference's folder scanner only
        # accepts names ending in "jpg" (DatasetReader.h:41) but cv::imread
        # (and PIL) sniff the magic bytes — lossless frames for both systems
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i:05d}.jpg"),
                                  format="PNG")
    with open(os.path.join(out_dir, "times.txt"), "w") as f:
        for i in range(len(poses)):
            f.write(f"{i:05d} {i * 0.05:.6f} 1.0\n")
    with open(os.path.join(out_dir, "camera.txt"), "w") as f:
        f.write(f"Pinhole {0.55 * w} {0.55 * w} {(w - 1) / 2.0} "
                f"{(h - 1) / 2.0} 0\n{w} {h}\nnone\n{w} {h}\n")
    np.save(os.path.join(out_dir, "gt_poses.npy"), np.stack(poses))
    return calib, scene


def write_vocab(out_dir, scene, calib, n_views=8):
    import jax.numpy as jnp
    from ldso_tpu.frontend import detector
    from ldso_tpu.loop.vocab import Vocabulary
    from ldso_tpu.ops.preprocess import make_pyramid

    descs = []
    for k in range(n_views):
        T = np.eye(4)
        T[:3, 3] = [-0.3 * k, 0.08 * k, 0.0]
        img, _ = scene.render(calib,
                              jnp.asarray(np.linalg.inv(T), jnp.float32))
        pyr = make_pyramid(img, calib.levels)
        feats = detector.detect_corners(pyr.dI[0], pyr.abs_grad[0], 500)
        valid = np.asarray(feats["valid"] & feats["is_corner"])
        descs.append(np.asarray(feats["desc"])[valid])
    voc = Vocabulary.train(np.concatenate(descs, axis=0), k=8, L=3, seed=7)
    path = os.path.join(out_dir, "vocab.dbow3")
    voc.save_binary(path)
    return path


def read_tum(path):
    ts, mats = [], []
    if not os.path.exists(path):
        return ts, mats
    for line in open(path):
        v = [float(x) for x in line.split()]
        if len(v) != 8:
            continue
        t, tx, ty, tz, qx, qy, qz, qw = v
        n = qx * qx + qy * qy + qz * qz + qw * qw
        if n < 1e-12:
            continue
        R = _quat_R(qx, qy, qz, qw)
        T_wc = np.eye(4)
        T_wc[:3, :3] = R
        T_wc[:3, 3] = [tx, ty, tz]
        ts.append(t)
        mats.append(np.linalg.inv(T_wc))   # store T_cw like gt
    return ts, mats


def _quat_R(x, y, z, w):
    n = 1.0 / np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x * n, y * n, z * n, w * n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def sim_ate(est_Tcw, gt_Tcw):
    est_c = np.stack([np.linalg.inv(T)[:3, 3] for T in est_Tcw])
    gt_c = np.stack([np.linalg.inv(T)[:3, 3] for T in gt_Tcw])
    ec = est_c - est_c.mean(0)
    gc = gt_c - gt_c.mean(0)
    s = np.sqrt((gc ** 2).sum() / max((ec ** 2).sum(), 1e-12))
    U, _, Vt = np.linalg.svd(ec.T @ gc)
    R = (U @ Vt).T
    return float(np.sqrt(np.mean(np.sum((gc - s * (ec @ R.T)) ** 2, 1))))


def ate_vs_gt(result_file, gt, dt=0.05):
    ts, mats = read_tum(result_file)
    if not mats:
        return None, 0
    ids = [int(round(t / dt)) for t in ts]
    keep = [(m, gt[i]) for i, m in zip(ids, mats) if 0 <= i < len(gt)]
    est = [m for m, _ in keep]
    g = [x for _, x in keep]
    return sim_ate(est, g), len(est)


def run_reference(ref_bin, dataset, vocab, loopclosing, quiet=True):
    cmd = [ref_bin,
           f"files={dataset}/images", f"calib={dataset}/camera.txt",
           f"vocab={vocab}", "preset=0", "mode=1",
           f"loopclosing={int(loopclosing)}", "nogui=1", "speed=0",
           f"output={dataset}/ref_results.txt"]
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                       cwd=dataset)
    dt = time.time() - t0
    out = p.stdout + p.stderr
    loops = re.findall(r"Loop detected from kf (\d+) to (\d+)", out)
    m = re.search(r"(\d+\.?\d*) fps", out)
    return dict(rc=p.returncode, wall=dt, loops=loops,
                log=out[-3000:],
                results=os.path.join(dataset, "ref_results.txt"))


def run_ours(dataset, vocab, loopclosing):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "/root/repo/examples/run_dso_tum_mono.py",
           f"files={dataset}/images", f"calib={dataset}/camera.txt",
           f"vocab={vocab}", "preset=0", "mode=1",
           f"loopclosing={int(loopclosing)}", "nogui=1",
           f"output={dataset}/tpu_results.txt"]
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3000,
                       env=env, cwd=dataset)
    dt = time.time() - t0
    out = p.stdout + p.stderr
    loops = re.findall(r"loop closed: kf (\d+) -> (\d+)", out)
    if not loops:
        m = re.search(r"loops closed: (\d+)", out)
        loops = ["?"] * int(m.group(1)) if m else []
    return dict(rc=p.returncode, wall=dt, loops=loops, log=out[-3000:],
                results=os.path.join(dataset, "tpu_results.txt"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--traj", choices=["straight", "revisit"],
                    default="revisit")
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--ref", default="/tmp/refbuild/run_dso_tum_mono")
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--scene", choices=["plane", "boxes"], default="plane")
    args = ap.parse_args()

    out = args.out or f"/tmp/h2h_{args.traj}_{args.scene}"
    os.makedirs(out, exist_ok=True)
    gen = straight_poses if args.traj == "straight" else revisit_poses
    poses = gen(args.frames)
    print(f"writing {args.frames}-frame {args.traj} dataset to {out} ...")
    calib, scene = write_dataset(out, poses,
                                 gains=brightness_gain(args.traj, args.frames),
                                 scene_name=args.scene)
    vocab = write_vocab(out, scene, calib)
    gt = np.load(os.path.join(out, "gt_poses.npy"))

    report = {}
    if not args.skip_ref:
        print("running reference ...")
        r = run_reference(args.ref, out, vocab, loopclosing=True)
        ate, n = ate_vs_gt(r["results"], gt)
        ate_nl, n_nl = ate_vs_gt(r["results"] + ".noloop", gt)
        report["reference"] = dict(
            rc=r["rc"], wall_s=round(r["wall"], 1), kfs=n,
            loops=len(r["loops"]), loop_pairs=r["loops"][:8],
            ate_mm=None if ate is None else round(ate * 1000, 4),
            ate_noloop_mm=None if ate_nl is None else round(ate_nl * 1000, 4))
        if r["rc"] != 0 or ate is None:
            print("REF LOG TAIL:\n", r["log"][-2000:])
    if not args.skip_ours:
        print("running ldso_tpu ...")
        r = run_ours(out, vocab, loopclosing=True)
        ate, n = ate_vs_gt(r["results"], gt)
        ate_nl, _ = ate_vs_gt(r["results"] + ".noloop", gt)
        report["ldso_tpu"] = dict(
            rc=r["rc"], wall_s=round(r["wall"], 1), kfs=n,
            loops=len(r["loops"]),
            ate_mm=None if ate is None else round(ate * 1000, 4),
            ate_noloop_mm=None if ate_nl is None else round(ate_nl * 1000, 4))
        if r["rc"] != 0 or ate is None:
            print("TPU LOG TAIL:\n", r["log"][-2000:])

    import json
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
