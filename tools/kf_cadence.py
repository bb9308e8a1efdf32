"""Keyframe-cadence root-cause harness (VERDICT r3 #3).

On the revisit head-to-head the reference made 106 KFs / 150 frames while
ldso_tpu made 29 — under identical frames and identical constant-1.0
exposure metadata. The KF criterion formula is implemented faithfully
(full_system._keyframe_decision vs FullSystem.cc:125-147), so the inputs
must diverge. This tool instruments BOTH systems' per-frame score terms:

  * ldso_tpu: `FullSystem.kf_score_log` records flowT/flowRT/rel_a/score
    per frame, in-process.
  * reference: a patched COPY of FullSystem.cc (one fprintf after the b2
    line — /root/reference itself is never touched) is compiled against
    the existing /tmp/refbuild objects and run on the same dataset; its
    KFSCORE stderr lines carry the same terms.

Output: a per-frame table of both systems' terms + a summary of which
term crosses the KF threshold, written to stdout (paste into BASELINE.md).

Usage:
  python tools/kf_cadence.py [--frames 150] [--build /tmp/refbuild]
      [--dataset /tmp/h2h_revisit]   (reuses an existing dataset folder)
"""

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.head_to_head import (brightness_gain, revisit_poses,  # noqa: E402
                                write_dataset, write_vocab)

PATCH_ANCHOR = "bool b2 = 2 * coarseTracker->firstCoarseRMSE < tres[0];"
PATCH = (
    '\n                fprintf(stderr, "KFSCORE id=%d res0=%f flowT=%f '
    'flowR=%f flowRT=%f rel_a=%f aff_a=%f aff_b=%f score=%f b2=%d\\n", '
    'fh->frame->id, (double)tres[0], (double)tres[1], (double)tres[2], '
    '(double)tres[3], (double)refToFh[0], (double)fh->aff_g2l().a, '
    '(double)fh->aff_g2l().b, (double)b, (int)b2);\n')


def build_instrumented(build_dir: str) -> str:
    """Compile a patched copy of the reference's FullSystem.cc and relink
    run_dso_tum_mono against the existing object set."""
    src = "/root/reference/src/frontend/FullSystem.cc"
    patched = os.path.join(build_dir, "FullSystem_instr.cc")
    text = open(src).read()
    assert PATCH_ANCHOR in text, "reference KF-decision anchor not found"
    open(patched, "w").write(text.replace(PATCH_ANCHOR,
                                          PATCH_ANCHOR + PATCH, 1))

    flags = ("-O3 -march=native -mno-avx512fp16 -std=c++14 -w -pthread "
             "-include string -include ostream -include deque -include map "
             "-include unistd.h "
             "-I/root/repo/tools/ref_shims -I/root/reference/include "
             "-I/root/reference/examples -I/root/reference/thirdparty "
             "-I/root/reference/thirdparty/sophus "
             "-I/root/reference/thirdparty/g2o "
             "-I/opt/venv/lib/python3.12/site-packages/tensorflow/include "
             "-I/usr/include/opencv4").split()
    obj_dir = os.path.join(build_dir, "obj")
    objs = [os.path.join(obj_dir, o) for o in os.listdir(obj_dir)
            if o.endswith(".o") and "FullSystem" not in o]
    instr_obj = os.path.join(build_dir, "FullSystem_instr.o")
    subprocess.run(["g++"] + flags + ["-c", patched, "-o", instr_obj],
                   check=True)
    exe = os.path.join(build_dir, "run_dso_tum_mono_instr")
    subprocess.run(
        ["g++"] + flags
        + ["/root/reference/examples/run_dso_tum_mono.cc", instr_obj]
        + objs + ["-o", exe, "-lopencv_core", "-lopencv_imgproc",
                  "-lopencv_imgcodecs", "-lopencv_highgui",
                  "-lopencv_calib3d", "-lpthread"],
        check=True)
    return exe


def run_reference(exe, dataset, vocab):
    cmd = [exe, f"files={dataset}/images", f"calib={dataset}/camera.txt",
           f"vocab={vocab}", "preset=0", "mode=1", "loopclosing=1",
           "nogui=1", "speed=0", f"output={dataset}/ref_results.txt"]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                       cwd=dataset)
    rows = []
    for line in p.stderr.splitlines():
        if not line.startswith("KFSCORE"):
            continue
        d = dict(re.findall(r"(\w+)=([-\d.einf]+)", line))
        rows.append({k: float(v) for k, v in d.items()})
    loops = re.findall(r"Loop detected", p.stdout + p.stderr)
    return rows, len(loops), p.returncode


def run_ours(dataset, frames, dso_affine=False):
    import dataclasses
    from PIL import Image
    from ldso_tpu.config import Config
    from ldso_tpu.system.full_system import FullSystem
    from ldso_tpu.camera.undistort import Undistorter

    calib = Undistorter.from_file(
        os.path.join(dataset, "camera.txt")).calibration()
    # full mode=1 semantics (run_dso_tum_mono.cc:258-266): no photometric
    # calibration AND free affine (the reference zeroes the a/b priors;
    # leaving our defaults pins a~0 and pushes the ramp into b, which
    # silently defeats the affine KF term)
    cfg = dataclasses.replace(Config(), enable_loop_closing=False,
                              photometric_calibration=0,
                              affine_opt_mode_a=0.0, affine_opt_mode_b=0.0,
                              kf_affine_frame_zero=not dso_affine)
    fs = FullSystem(calib, cfg)
    fs.kf_score_log = []
    for i in range(frames):
        img = np.asarray(Image.open(
            os.path.join(dataset, "images", f"{i:05d}.jpg")))
        fs.add_active_frame(img, i, 1.0, i * 0.05)
        if fs.is_lost:
            break
    return fs.kf_score_log, fs.global_map.num_frames()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--build", default="/tmp/refbuild")
    ap.add_argument("--dataset", default="/tmp/h2h_revisit")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--dso-affine", action="store_true",
                    help="run ldso_tpu with kf_affine_frame_zero=False "
                         "(upstream-DSO KF-affine semantics)")
    args = ap.parse_args()

    ds = args.dataset
    if not os.path.exists(os.path.join(ds, "times.txt")):
        print(f"rendering revisit dataset -> {ds}")
        os.makedirs(ds, exist_ok=True)
        poses = revisit_poses(args.frames)
        calib, scene = write_dataset(
            ds, poses, gains=brightness_gain("revisit", args.frames))
        write_vocab(ds, scene, calib)
    vocab = os.path.join(ds, "vocab.dbow3")

    report = {}
    if not args.skip_ref:
        exe = build_instrumented(args.build)
        rows, n_loops, rc = run_reference(exe, ds, vocab)
        report["reference"] = dict(rc=rc, frames=len(rows), loops=n_loops,
                                   kfs=int(sum(r["score"] > 1 or r["b2"]
                                               for r in rows)))
        np.save(os.path.join(ds, "ref_kfscore.npy"), rows,
                allow_pickle=True)
        print(json.dumps(report["reference"]))
    if not args.skip_ours:
        ours, kfs = run_ours(ds, args.frames, dso_affine=args.dso_affine)
        tag = "dso" if args.dso_affine else "ldso"
        report["ldso_tpu"] = dict(frames=len(ours), kfs=kfs, affine=tag)
        np.save(os.path.join(ds, f"tpu_kfscore_{tag}.npy"), ours,
                allow_pickle=True)
        np.save(os.path.join(ds, "tpu_kfscore.npy"), ours,
                allow_pickle=True)
        print(json.dumps(report["ldso_tpu"]))

    # per-frame comparison table
    try:
        ref = list(np.load(os.path.join(ds, "ref_kfscore.npy"),
                           allow_pickle=True))
        tpu = list(np.load(os.path.join(ds, "tpu_kfscore.npy"),
                           allow_pickle=True))
        by_id_ref = {int(r["id"]): r for r in ref}
        by_id_tpu = {int(r["id"]): r for r in tpu}
        print("\nframe |   ref: score  |log a|  flowT  flowRT  kf "
              "|   tpu: score  |log a|  flowT  flowRT  kf")
        for i in sorted(set(by_id_ref) | set(by_id_tpu)):
            r, t = by_id_ref.get(i), by_id_tpu.get(i)
            def fmt(d, score_key="score"):
                if d is None:
                    return " " * 44
                la = abs(np.log(max(d["rel_a"], 1e-12)))
                kf = (d[score_key] > 1) or bool(d.get("b2")) \
                    if "kf" not in d else d["kf"]
                return (f"{d[score_key]:7.3f} {la:7.3f} "
                        f"{np.sqrt(max(d['flowT'], 0)):7.2f} "
                        f"{np.sqrt(max(d['flowRT'], 0)):7.2f} {int(kf):2d}")
            print(f"{i:5d} | {fmt(r)} | {fmt(t)}")
    except Exception as e:  # noqa: BLE001
        print("table failed:", e)


if __name__ == "__main__":
    main()
