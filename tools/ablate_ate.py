"""ATE-gap ablation (VERDICT r2 #4): which deviation from the reference
moves the head-to-head ATE needle (ldso_tpu 0.179 mm vs reference
0.101 mm on the 104-frame straight synthetic)?

Candidate causes, toggled ONE at a time against the production config:
  nearest_trace : trace_search_nearest=False — the reference's bilinear
                  SSD epipolar search (ImmaturePoint.cc:182-205) instead
                  of the single-tap nearest-sample search.
  host_f64_ba   : ba_device_lm=False — host-orchestrated LM with f64
                  HM/bM and f64 scaled LDLT (EnergyFunctional.cc:324-337
                  double semantics) instead of the all-f32 device program.
  dist_map_40   : dist_map_steps=40 — the reference's BFS bound
                  (CoarseTracker.cc:726) instead of the decision-equivalent
                  18-step cap.

Runs each variant over the identical rendered sequence in-process
(synchronous mode — deterministic replay) and reports sim(3)-aligned ATE
+ keyframe count. Results belong in BASELINE.md's ablation table.

Usage:  python tools/ablate_ate.py [--frames 104] [--only name[,name]]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_sequence(n, scene_name="plane"):
    import jax.numpy as jnp
    from ldso_tpu.math import lie
    from ldso_tpu.synthetic import make_scene, default_calib

    calib = default_calib(640, 480)
    # n_waves=32: the EXACT scene tools/head_to_head.py renders, so these
    # ATEs ablate against the measured reference 0.101 mm on the same frames
    scene = make_scene(scene_name, freq_hi=25.0, contrast=80.0, n_waves=32)
    poses, images = [], []
    for i in range(n):
        t = np.array([0.03 * i, 0.01 * np.sin(0.2 * i), 0.004 * i])
        w = np.array([0.0, 0.0018 * i, 0.0004 * i])
        T_wc = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([t, w]))))
        poses.append(np.linalg.inv(T_wc))
        img, _ = scene.render(calib, jnp.asarray(poses[-1], jnp.float32))
        images.append(np.clip(np.round(np.asarray(img)), 0, 255)
                      .astype(np.uint8))
    return calib, poses, images


def sim_ate(est, gt):
    est_c = np.stack([np.linalg.inv(T)[:3, 3] for T in est])
    gt_c = np.stack([np.linalg.inv(T)[:3, 3] for T in gt])
    ec = est_c - est_c.mean(0)
    gc = gt_c - gt_c.mean(0)
    s = np.sqrt((gc ** 2).sum() / max((ec ** 2).sum(), 1e-12))
    U, _, Vt = np.linalg.svd(ec.T @ gc)
    R = (U @ Vt).T
    return float(np.sqrt(np.mean(np.sum((gc - s * (ec @ R.T)) ** 2, 1))))


def run_variant(name, cfg, calib, poses, images):
    from ldso_tpu.system.full_system import FullSystem
    fs = FullSystem(calib, cfg)
    t0 = time.time()
    for i, img in enumerate(images):
        fs.add_active_frame(img, i, 1.0, i * 0.05)
        if fs.is_lost:
            break
    wall = time.time() - t0
    est_ids = [f.id for f in fs.all_frames if f.pose_valid]
    est = [f.T_cw for f in fs.all_frames if f.pose_valid]
    gt = [poses[i] for i in est_ids]
    ate = sim_ate(est, gt) if len(est) >= 3 else float("nan")
    kfs = fs.global_map.num_frames()

    # the head-to-head / CLI metric: KEYFRAME trajectory only, and (like
    # run_common.py + the reference's shutdown lastOptimizeAllKFs) once
    # more after a final pose-graph pass over the odometry edges
    kf_list = fs.global_map.get_all_kfs()
    kf_est = [k.T_cw for k in kf_list]
    kf_gt = [poses[k.id] for k in kf_list]
    ate_kf = sim_ate(kf_est, kf_gt) if len(kf_est) >= 3 else float("nan")
    try:
        from ldso_tpu.loop import posegraph
        posegraph.run_pose_graph(fs.global_map)
        kf_pgo = [k.get_S_cw() for k in fs.global_map.get_all_kfs()]
        ate_pgo = sim_ate(kf_pgo, kf_gt) if len(kf_pgo) >= 3 else float("nan")
    except Exception as e:  # noqa: BLE001 — optional refinement
        ate_pgo = float("nan")
    return dict(variant=name, ate_mm=round(ate * 1000, 4),
                ate_kf_mm=round(ate_kf * 1000, 4),
                ate_kf_pgo_mm=round(ate_pgo * 1000, 4), kfs=kfs,
                frames=len(est), lost=bool(fs.is_lost),
                wall_s=round(wall, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=104)
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of variant names")
    ap.add_argument("--scene", choices=["plane", "boxes"], default="plane")
    args = ap.parse_args()

    from ldso_tpu.config import Config
    # mode=1 semantics (no photometric calib files), matching the CLI run
    # that produced the head-to-head 0.179 mm (tools/head_to_head.py run_ours)
    # full mode=1 semantics incl. zeroed affine priors
    # (run_dso_tum_mono.cc:258-266), matching examples/run_common.py
    base = dataclasses.replace(Config(), enable_loop_closing=False,
                               photometric_calibration=0,
                               affine_opt_mode_a=0.0, affine_opt_mode_b=0.0)
    variants = {
        "default": base,
        "nearest_trace_off": dataclasses.replace(
            base, trace_search_nearest=False),
        # round-3 default: nearest search WITHOUT the bilinear +-2-step
        # re-score (isolates trace_refine_steps' contribution)
        "no_refine": dataclasses.replace(base, trace_refine_steps=0),
        # exact per-tap gathers instead of the pattern-packed search
        # (isolates the unrotated-pattern approximation of trace_packed)
        "trace_packed_off": dataclasses.replace(base, trace_packed=False),
        # upstream-DSO keyframe-affine semantics (vs the LDSO
        # FullSystem.cc:133 frame-affine-is-zero quirk, now the default)
        "dso_kf_affine": dataclasses.replace(base,
                                             kf_affine_frame_zero=False),
        "host_f64_ba": dataclasses.replace(base, ba_device_lm=False),
        "dist_map_40": dataclasses.replace(base, dist_map_steps=40),
        # sliced newest-column final relinearize with sticky OOB (vs the
        # default full-lattice finalize with OOB reset; r5 ablation:
        # plane 0.1136 vs 0.1017, boxes 1.445 vs 1.637)
        "ba_finalize_sliced": dataclasses.replace(base,
                                                  ba_finalize_sliced=True),
    }
    if args.only:
        keep = set(args.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    calib, poses, images = render_sequence(args.frames, args.scene)
    out = []
    for name, cfg in variants.items():
        print(f"--- {name} ...", flush=True)
        try:
            r = run_variant(name, cfg, calib, poses, images)
        except Exception as e:  # noqa: BLE001 — report and continue
            r = dict(variant=name, error=f"{type(e).__name__}: {e}")
        out.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"reference_ate_mm": 0.101, "ablation": out}))


if __name__ == "__main__":
    main()
