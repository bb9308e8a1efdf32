"""Shared CLI runner: the reference's key=value argument parsing, presets,
frame loop, init-failure auto-reset, fps reporting, and trajectory output
(mirrors examples/run_dso_tum_mono.cc:91-471)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def parse_args(argv):
    opts = dict(files=None, calib=None, gamma=None, vignette=None,
                vocab=None, preset=0, mode=0, loopclosing=True,
                start=0, end=100000, output="results.txt", nogui=True,
                point_selection=None, quiet=False, speed=0.0,
                noise=0.0, blur=0.0, pipeline=None)
    for arg in argv:
        if "=" not in arg:
            continue
        k, v = arg.split("=", 1)
        if k in ("files", "calib", "gamma", "vignette", "vocab", "output"):
            opts[k] = v
        elif k in ("preset", "mode", "start", "end"):
            opts[k] = int(v)
        elif k == "loopclosing":
            opts[k] = v not in ("0", "false", "False")
        elif k == "pointSelection":
            opts["point_selection"] = int(v)
        elif k == "speed":
            opts["speed"] = float(v)   # >0: timestamp-paced, skip if behind
        elif k == "pipeline":
            # strict: per-frame sync loop (linearizeOperation semantics);
            # lookahead: deterministic speculative dispatch (same
            # trajectory decisions, overlapped tunnel round-trips);
            # async: mapping thread (the reference's threaded mode).
            # Default follows the reference: speed==0 -> strict
            # (playbackSpeed==0 => linearizeOperation=true,
            # run_dso_tum_mono.cc:323), speed>0 -> async.
            assert v in ("strict", "lookahead", "async"), f"pipeline={v}"
            opts["pipeline"] = v
        elif k == "noise":
            # benchmark_varNoise equivalent (px; Setting.cc:95-101)
            opts["noise"] = float(v)
        elif k == "blur":
            # benchmark_varBlurNoise equivalent (sigma; Setting.cc:95-101)
            opts["blur"] = float(v)
        elif k == "quiet":
            opts["quiet"] = v not in ("0", "false", "False")
        elif k == "nogui":
            # nogui=0 starts the live HTTP viewer (ldso_tpu/viz_live.py),
            # the Pangolin-GUI equivalent (run_dso_tum_mono.cc:151-157)
            opts["nogui"] = v not in ("0", "false", "False")
        elif k == "viewerport":
            opts["viewer_port"] = int(v)
        elif k in ("nolog", "nomt", "save"):
            pass  # accepted for CLI parity; no-ops here
    return opts


def build_system(opts, dataset_type: str):
    import jax.numpy as jnp
    from ldso_tpu.config import preset as make_preset
    import dataclasses

    from ldso_tpu.io.datasets import ImageFolderReader
    from ldso_tpu.system.full_system import FullSystem
    from ldso_tpu.loop.vocab import Vocabulary

    if opts["files"] is None or opts["calib"] is None:
        print("usage: files=<path> calib=<camera.txt> [gamma=] [vignette=] "
              "[vocab=] [preset=0..3] [mode=0|1] [loopclosing=1] "
              "[start=] [end=] [output=results.txt] [noise=px] [blur=sigma] "
              "[pipeline=strict|lookahead|async]")
        sys.exit(1)

    cfg = make_preset(opts["preset"])
    # mode=1: photometric calibration absent (run_dso_kitti default)
    if opts["mode"] == 1:
        cfg = dataclasses.replace(cfg, photometric_calibration=0,
                                  affine_opt_mode_a=0.0, affine_opt_mode_b=0.0)
    cfg = dataclasses.replace(cfg, enable_loop_closing=opts["loopclosing"])
    if opts["point_selection"] is not None:
        cfg = dataclasses.replace(cfg, point_selection=opts["point_selection"])

    reader = ImageFolderReader(opts["files"], opts["calib"], opts["gamma"],
                               opts["vignette"], dataset_type=dataset_type)
    reader.var_noise = opts.get("noise", 0.0)
    reader.var_blur = opts.get("blur", 0.0)
    calib = reader.calibration()

    vocab = None
    if opts["vocab"] and os.path.exists(opts["vocab"]):
        try:
            vocab = Vocabulary.load(opts["vocab"])  # sniffs binary .dbow3 vs text
            print(f"loaded vocabulary: {vocab.n_words} words")
        except Exception as e:  # noqa: BLE001
            print(f"vocabulary load failed ({e}); training online instead")

    b_grad = None
    pc = reader.undistorter.photometric
    if pc is not None and pc.valid and cfg.gamma_weights_pixel_select:
        B = pc.inverse_response_B()
        b_grad = np.diff(np.concatenate([B, B[-1:]])).astype(np.float32)

    fs = FullSystem(calib, cfg, b_grad_lut=b_grad, vocab=vocab)
    return fs, reader, calib, cfg


def run(opts, dataset_type: str, kitti_output: bool = False):
    from ldso_tpu.io.trajectory import write_kitti, write_tum, save_ply
    from ldso_tpu.system.full_system import FullSystem
    from ldso_tpu.utils.timing import maybe_xprof

    fs, reader, calib, cfg = build_system(opts, dataset_type)
    # pipeline mode: the reference runs its mapping thread unless
    # playbackSpeed==0 forces the synchronous linearizeOperation path
    # (run_dso_tum_mono.cc:323, FullSystem.cc:160-167)
    pmode = opts.get("pipeline") or (
        "async" if opts.get("speed", 0.0) > 0 else "strict")

    def make_driver(fs):
        if pmode == "async":
            from ldso_tpu.system.pipeline import AsyncPipeline
            return AsyncPipeline(fs)
        if pmode == "lookahead":
            from ldso_tpu.system.pipeline import DeterministicPipeline
            return DeterministicPipeline(fs)
        return fs

    driver = make_driver(fs)
    viewer = None
    if not opts.get("nogui", True):
        from ldso_tpu.viz_live import LiveViewer
        viewer = LiveViewer(port=opts.get("viewer_port", 8765)).start()
        fs.set_viewer(viewer)
        print(f"live viewer: http://127.0.0.1:{viewer.port}/")
    n = reader.num_images()
    lo, hi = opts["start"], min(opts["end"], n)
    print(f"dataset: {n} images, running [{lo}, {hi})  "
          f"{calib.w[0]}x{calib.h[0]}, {calib.levels} levels")

    t0 = time.time()
    n_run = 0
    n_skipped = 0
    i = lo
    ts0 = None
    speed = opts.get("speed", 0.0)
    stamps = reader.timestamps
    xprof = maybe_xprof()
    xprof.__enter__()   # no-op unless LDSO_TPU_XPROF is set
    while i < hi:
        # timestamp-paced playback: when running slower than speed x
        # real time, drop frames to catch up (run_dso_tum_mono.cc:363-398)
        if speed > 0 and stamps and n_run > 0:
            if ts0 is None:
                ts0 = stamps[lo]
            behind = (time.time() - t0) - (stamps[i] - ts0) / speed
            if behind > 0 and i + 1 < hi:
                i += 1
                n_skipped += 1
                continue
        img, expo, ts = reader.get_image(i)
        driver.add_active_frame(img, i, expo, ts)
        n_run += 1

        # init-failure auto-reset within the first 250 frames
        # (run_dso_tum_mono.cc:404-417)
        if fs.init_failed and i - lo < 250:
            print(f"init failed at frame {i}; resetting")
            fs, reader2, calib, cfg = build_system(opts, dataset_type)
            driver = make_driver(fs)
            if viewer is not None:
                fs.set_viewer(viewer)
        if fs.is_lost:
            print(f"LOST at frame {i}")
            break
        if n_run % 50 == 0:
            dt = time.time() - t0
            print(f"frame {i}: {n_run / dt:.2f} fps, "
                  f"{fs.global_map.num_frames()} KFs")
        i += 1

    if pmode != "strict" and not fs.is_lost:
        # blockUntilMappingIsFinished (FullSystem.cc:384-409); includes the
        # shutdown-time pose-graph pass (Map::lastOptimizeAllKFs)
        driver.block_until_mapping_is_finished()
    xprof.__exit__(None, None, None)
    dt = time.time() - t0
    print(f"processed {n_run} frames in {dt:.1f}s = {n_run / max(dt, 1e-9):.2f} fps"
          + (f" ({n_skipped} skipped for pacing)" if n_skipped else ""))
    if not opts.get("quiet"):
        print(fs.timer.summary())

    # final global optimization + outputs
    if fs.loop_closing is not None:
        print(f"loops closed: {fs.loop_closing.n_loops_closed}")
    if (pmode == "strict" and fs.loop_closing is not None
            and fs.global_map.num_frames() > 4):
        from ldso_tpu.loop import posegraph
        posegraph.run_pose_graph(fs.global_map)

    out = opts["output"]
    kfs = fs.global_map.get_all_kfs()
    if kitti_output:
        write_kitti(out, [kf.id for kf in kfs], [kf.get_S_cw() for kf in kfs])
        write_kitti(out + ".noloop", [kf.id for kf in kfs],
                    [kf.T_cw for kf in kfs])
    else:
        write_tum(out, [kf.timestamp for kf in kfs],
                  [kf.get_S_cw() for kf in kfs])
        write_tum(out + ".noloop", [kf.timestamp for kf in kfs],
                  [kf.T_cw for kf in kfs])
    fs.flush_active_points()   # live window points join the map
    pc = fs.global_map.point_cloud()
    if len(pc):
        save_ply(os.path.join(os.path.dirname(out) or ".", "pointcloud.ply"), pc)
    print(f"wrote {out} (+.noloop), {len(pc)} map points")
    if viewer is not None:
        viewer.publish_keyframes(fs.global_map)   # final refresh
    return fs
