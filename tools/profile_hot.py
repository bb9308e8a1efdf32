"""Microbenchmark the hot device programs on the real TPU.

Uses QUEUED timing (the verify-skill methodology): dispatch N reps
back-to-back and block once at the end — per-rep blocking measures the
~30 ms tunnel round-trip, not device time.

Usage: python tools/profile_hot.py [section ...]   (default: all)
Sections: gather tracker trace
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def qtime(fn, *args, n=20, warm=2, **kw):
    """Queued device time per call, ms (median of 3 windows)."""
    import jax
    for _ in range(warm):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    meds = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args, **kw) for _ in range(n)]
        jax.block_until_ready(outs[-1])
        meds.append((time.perf_counter() - t0) / n)
    return float(np.median(meds)) * 1e3


def main():
    sections = set(sys.argv[1:]) or {"gather", "tracker", "trace"}
    import jax
    import jax.numpy as jnp
    from ldso_tpu.config import Config
    from ldso_tpu.math import lie
    from ldso_tpu.ops import interp
    from ldso_tpu.ops.preprocess import make_pyramid
    from ldso_tpu.synthetic import PlaneScene, default_calib

    print("device:", jax.devices()[0])
    cfg = Config()
    calib = default_calib(640, 480)
    scene = PlaneScene(freq_hi=25.0, contrast=80.0)
    img0, id0 = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
    pyr0 = make_pyramid(img0, calib.levels)
    T1 = lie.se3_exp(jnp.asarray([0.02, -0.01, 0.005, 0.002, 0.004, -0.001],
                                 jnp.float32))
    img1, _ = scene.render(calib, T1)
    pyr1 = make_pyramid(img1, calib.levels)

    if "gather" in sections:
        key = jax.random.PRNGKey(0)
        for lvl in [0, 1, 2]:
            H, W = calib.h[lvl], calib.w[lvl]
            img = pyr1.dI[lvl]
            packed = jax.jit(lambda im: interp.pack_taps(im))(img)
            jax.block_until_ready(packed)
            N = cfg.tracker_caps[lvl]
            kx, ky = jax.random.split(key)
            x = jax.random.uniform(kx, (N,), minval=3.0, maxval=W - 4.0)
            y = jax.random.uniform(ky, (N,), minval=3.0, maxval=H - 4.0)

            f4 = jax.jit(lambda im, a, b: interp.bilinear(im, a, b))
            fp = jax.jit(lambda im, a, b: interp.bilinear_packed(im, a, b, 3))
            t4 = qtime(f4, img, x, y)
            tp = qtime(fp, packed, x, y)
            tpk = qtime(jax.jit(lambda im: interp.pack_taps(im)), img)
            print(f"gather lvl{lvl} N={N}: 4-tap {t4:.3f} ms, "
                  f"packed {tp:.3f} ms, pack_taps build {tpk:.3f} ms")

    if "tracker" in sections:
        from ldso_tpu.frontend import tracker
        ref = tracker.make_tracker_ref_from_idepth(
            id0, pyr0, calib, cfg.tracker_caps[:calib.levels], stride=2)
        jax.block_until_ready(ref)
        coarsest = calib.levels - 1
        min_abort = jnp.full((calib.levels,), 1e9, jnp.float32)
        aff0 = jnp.zeros(2, jnp.float32)

        t_full = qtime(tracker.track_frame, ref, pyr1, jnp.eye(4), aff0,
                       jnp.float32(1.0), min_abort, calib, cfg, coarsest,
                       n=10)
        print(f"track_frame (full pyramid LM): {t_full:.2f} ms")

        for lvl in range(calib.levels):
            def one(T, lvl=lvl):
                bufs, stats = tracker._calc_res(
                    ref, pyr1, lvl, T, aff0, jnp.float32(1.0),
                    jnp.float32(cfg.coarse_cutoff_th), calib, cfg,
                    compute_flow=(lvl == 0))
                H, b, _ = tracker._calc_gs(bufs, lvl, ref, aff0,
                                           jnp.float32(1.0), calib)
                return H, b, stats
            t1 = qtime(jax.jit(one), jnp.eye(4, dtype=jnp.float32))
            print(f"  calc_res+gs lvl{lvl} (N={cfg.tracker_caps[lvl]}): "
                  f"{t1:.3f} ms")

        t_ref = qtime(tracker.make_tracker_ref_from_idepth, id0, pyr0,
                      calib, cfg.tracker_caps[:calib.levels], stride=2, n=10)
        print(f"make_tracker_ref: {t_ref:.2f} ms")

    if "trace" in sections:
        print("trace section: see tools in /tmp or bench.py ledger")


if __name__ == "__main__":
    main()
