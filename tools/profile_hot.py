"""Microbenchmark the hot device programs on the real TPU.

Methodology (round 4): CHAINED-DEPENDENCY timing with a two-point slope.
The axon relay's `block_until_ready` returns before execution completes
(queued timings measured 0.06 ms for a program whose true cost is ~4 ms),
so each rep must (a) consume the previous rep's output — the relay cannot
dedup or reorder a data-dependent chain — and (b) end with a real host
pull. The pull itself costs ~10-30 ms of tunnel latency; timing the chain
at two lengths and taking the slope
    t_per_step = (t(n2) - t(n1)) / (n2 - n1)
cancels it along with every other fixed cost.

Usage: python tools/profile_hot.py [section ...]   (default: all)
Sections: gather tracker trace
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_time(step, carry0, n1=3, n2=43, reps=5):
    """True per-step device time (ms) of `step: carry -> carry`.

    `step` must make each call depend on the previous call's output
    (thread some array through), so the relay executes n sequential
    programs. The two-point slope cancels the final host pull and any
    per-window fixed overhead. The pull itself carries ±tens-of-ms tunnel
    noise, so the gap n2-n1 must be wide enough that the signal
    (n2-n1) * t_step dominates it; reps medians suppress the rest."""
    import jax

    def run(n):
        carry = carry0
        t0 = time.perf_counter()
        for _ in range(n):
            carry = step(carry)
        # real host pull — block_until_ready does not block over the relay
        np.asarray(jax.tree_util.tree_leaves(carry)[0])
        return time.perf_counter() - t0

    run(2)  # warm compile + touch
    slopes = []
    for _ in range(reps):
        t1 = run(n1)
        t2 = run(n2)
        slopes.append((t2 - t1) / (n2 - n1))
    return float(np.median(slopes)) * 1e3


def _dep(x, out):
    """Mix a zero-valued function of `out` into `x` to force a data
    dependency without changing values."""
    import jax.numpy as jnp
    z = jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)) * 0.0
    return x + z.astype(x.dtype)


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
            N = cfg.tracker_caps[lvl]
            kx, ky = jax.random.split(key)
            x = jax.random.uniform(kx, (N,), minval=3.0, maxval=W - 4.0)
            y = jax.random.uniform(ky, (N,), minval=3.0, maxval=H - 4.0)

            f4 = jax.jit(lambda a, b: interp.bilinear(img, a, b))
            fp = jax.jit(lambda a, b: interp.bilinear_packed(packed, a, b, 3))
            fpk = jax.jit(lambda im: interp.pack_taps(im))
            t4 = chain_time(lambda c: (f4(_dep(x, c[0]), y),), (x * 0,))
            tp = chain_time(lambda c: (fp(_dep(x, c[0]), y),), (x * 0,))
            tpk = chain_time(lambda c: (fpk(_dep(img, c[0])),), (img * 0,))
            print(f"gather lvl{lvl} N={N}: 4-tap {t4:.3f} ms, "
                  f"packed {tp:.3f} ms, pack_taps build {tpk:.3f} ms")

    if "tracker" in sections:
        from ldso_tpu.frontend import tracker
        ref = tracker.make_tracker_ref_from_idepth(
            id0, pyr0, calib, cfg.tracker_caps[:calib.levels], stride=2)
        np.asarray(ref.points[0])
        coarsest = calib.levels - 1
        min_abort = jnp.full((calib.levels,), 1e9, jnp.float32)
        aff0 = jnp.zeros(2, jnp.float32)

        def track_step(carry):
            out = tracker.track_frame(ref, pyr1, carry[0], aff0,
                                      jnp.float32(1.0), min_abort, calib,
                                      cfg, coarsest)
            return (out[0],)

        t_full = chain_time(track_step, (jnp.eye(4, dtype=jnp.float32),),
                            n1=3, n2=23)
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
            onej = jax.jit(one)

            def lvl_step(carry, onej=onej):
                H, b, stats = onej(_dep(jnp.eye(4, dtype=jnp.float32),
                                        carry[0]))
                return (H,)
            t1 = chain_time(lvl_step, (jnp.zeros((8, 8), jnp.float32),))
            print(f"  calc_res+gs lvl{lvl} (N={cfg.tracker_caps[lvl]}): "
                  f"{t1:.3f} ms")

        def ref_step(carry):
            r = tracker.make_tracker_ref_from_idepth(
                _dep(id0, carry[0]), pyr0, calib,
                cfg.tracker_caps[:calib.levels], stride=2)
            return (r.points[0],)
        t_ref = chain_time(ref_step, (jnp.zeros((1,), jnp.float32),),
                           n1=2, n2=14)
        print(f"make_tracker_ref: {t_ref:.2f} ms")

    if "trace" in sections:
        from ldso_tpu.frontend import immature
        from ldso_tpu.ops.select import PixelSelector
        sel = PixelSelector(calib.w[0], calib.h[0], cfg)
        smap, _ = sel.select(pyr0, cfg.desired_immature_density)
        for lanes in (1024, 2048):
            arena = immature.empty_arena(lanes, cfg)
            arena = immature.arena_add_from_status(
                arena, smap, pyr0.dI[0], 0, min(lanes, cfg.max_immature), cfg)
            n_live = int(np.asarray(jnp.sum(arena.pool.valid)))
            K = jnp.asarray(calib.K(0), jnp.float32)
            Ki = jnp.asarray(calib.Ki(0), jnp.float32)
            KRKi = (K @ T1[:3, :3] @ Ki)[None]
            Kt = (K @ T1[:3, 3])[None]
            aff = jnp.asarray([[1.0, 0.0]], jnp.float32)
            F1 = jnp.broadcast_to(KRKi, (1, 3, 3))

            def trace_step(carry):
                a = carry[0]
                a = a._replace(pool=a.pool._replace(
                    u=_dep(a.pool.u, a.pool.idepth_min)))
                return (immature.trace_arena(a, pyr1.dI[0], F1,
                                             jnp.broadcast_to(Kt, (1, 3)),
                                             aff, calib, cfg),)
            t_tr = chain_time(trace_step, (arena,), n1=3, n2=23)
            print(f"trace_arena lanes={lanes} (live={n_live}): {t_tr:.2f} ms")


if __name__ == "__main__":
    main()
