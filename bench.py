"""Benchmark: frames/sec of the full visual-odometry pipeline on TPU.

Runs the complete track -> keyframe -> windowed-BA pipeline (the pure-DSO
slice, BASELINE config[0]) on a synthetic 640x480 sequence with exact
ground truth (no SLAM datasets ship in this container; the synthetic
renderer exercises the identical compute path with production shapes and
the production Config: 2048-point pool, 7-KF window, 1500 candidates).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Baseline: the reference, built from source and measured on this
container's CPU over the SAME synthetic trajectory: 54.0 ms/frame =
18.5 fps pure DSO (BASELINE.md "Measured reference numbers").

Every mode is measured in 3 consecutive windows and reports the MEDIAN
(tunnel latency to the axon TPU has ±2x "weather"; medians within one
process are the stable statistic — see BASELINE.md methodology).

Resilience: the axon relay throws transient INTERNAL/UNAVAILABLE
JaxRuntimeErrors (BASELINE.md documents ±2x weather; round 2's driver
bench died on one mid-warmup flake). Every frame dispatch retries with
backoff, every mode is isolated, and the JSON line is ALWAYS printed —
on unrecoverable failure it carries the windows measured so far plus an
"error" field. Exit code is 0 whenever the line was printed.
"""

import json
import sys
import time
import traceback

import numpy as np

# markers of transient relay/tunnel failures (remote_compile / transfer
# stream resets) — retryable; anything else is a real bug and propagates
_TRANSIENT_MARKERS = (
    "INTERNAL", "UNAVAILABLE", "DEADLINE_EXCEEDED", "RESOURCE_EXHAUSTED",
    "read body", "response body closed", "connection reset", "broken pipe",
    "remote_compile", "socket", "EOF",
)


def _is_transient(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    return any(m.lower() in s.lower() for m in _TRANSIENT_MARKERS)


def _retry(fn, *args, attempts: int = 3, backoff: float = 4.0, label: str = "",
           errors: list = None, **kw):
    """Run fn, retrying transient tunnel failures with backoff. Re-raises
    non-transient errors immediately and the last transient one after
    `attempts` tries."""
    for k in range(attempts):
        try:
            return fn(*args, **kw)
        except Exception as e:  # noqa: BLE001 — filtered by _is_transient
            if not _is_transient(e) or k == attempts - 1:
                raise
            if errors is not None:
                errors.append(f"transient[{label}#{k}]: {type(e).__name__}")
            time.sleep(backoff * (k + 1))


def _quant8(img) -> np.ndarray:
    """Quantize a rendered float image to raw 8-bit intensities — the
    reference's own input depth (its readers decode 8-bit PNGs,
    ImageRW_OpenCV.cc); uint8 frames also cross the host->device link 4x
    cheaper than float32, which bounds per-frame cost behind the tunnel."""
    return np.clip(np.round(np.asarray(img)), 0, 255).astype(np.uint8)


def _drive(fs_or_pipe, images, ids, errors, label):
    """Feed frames with per-frame transient retry; a frame that still fails
    after the retries is skipped (the pipeline tolerates dropped frames the
    same way the reference's catch-up logic does)."""
    fs = getattr(fs_or_pipe, "fs", fs_or_pipe)
    fed = 0
    for img, i in zip(images, ids):
        try:
            _retry(fs_or_pipe.add_active_frame, img, i, 1.0, i * 0.05,
                   label=f"{label}:f{i}", errors=errors)
            fed += 1
        except Exception as e:  # noqa: BLE001
            if not _is_transient(e):
                raise
            errors.append(f"dropped[{label}:f{i}]: {type(e).__name__}")
        if fs.is_lost:
            break
    return fed


def main():
    result = {
        "metric": "frames/sec synthetic 640x480 VO (pipelined, preset 0)",
        "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
    }
    errors = []
    rc = 0
    try:
        rc = _main(result, errors)
    except Exception:  # noqa: BLE001 — the JSON line must always print
        errors.append("fatal: " + traceback.format_exc(limit=3).replace(
            "\n", " | "))
    if errors:
        result["error"] = "; ".join(errors[:12])
    print(json.dumps(result))
    return rc


def _main(result, errors):
    import jax
    import jax.numpy as jnp
    import ldso_tpu  # noqa: F401
    from ldso_tpu.config import Config
    from ldso_tpu.math import lie
    from ldso_tpu.synthetic import PlaneScene, default_calib
    from ldso_tpu.system.full_system import FullSystem

    import dataclasses
    # BASELINE config[0]/[1] headline: pure DSO, loop closing off
    cfg = dataclasses.replace(Config(), enable_loop_closing=False)
    calib = default_calib(640, 480)
    scene = PlaneScene(freq_hi=25.0, contrast=80.0)
    result["device"] = str(jax.devices()[0])

    n_warm = 56       # bootstrap + overflow the window so marginalization
    n_sync_warm = 8   # unmeasured DeterministicPipeline pass: the lookahead
                      # driver's own executables (batched chain dispatch,
                      # packed-result slicing) load here, not in window 0
                      # (r4's window 0 measured 0.43 fps of executable loads)
    n_meas = 48       # (and its compiles) happen before the measured region
    N = n_warm + n_sync_warm + n_meas

    poses = []
    for i in range(N):
        t = np.array([0.03 * i, 0.01 * np.sin(0.2 * i), 0.004 * i])
        w = np.array([0.0, 0.0018 * i, 0.0004 * i])
        T_wc = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([t, w]))))
        poses.append(np.linalg.inv(T_wc))

    # pre-render (rendering is not part of the measured pipeline)
    images = []
    for T in poses:
        img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
        images.append(_quant8(img))

    fs = FullSystem(calib, cfg)
    _drive(fs, images[:n_warm], range(n_warm), errors, "warmup")
    if fs.is_lost or fs.init_failed:
        errors.append("diverged in warmup")
        return 0

    # pre-compile the retry programs (they run only on hard frames; their
    # first call must not land in the measured region)
    try:
        _retry(fs.warm_retrack_programs, label="precompile", errors=errors)
    except Exception as e:  # noqa: BLE001 — best-effort warmup only
        errors.append(f"precompile failed: {type(e).__name__}")

    # determinism mode: the lookahead driver overlaps each frame's ~30 ms
    # result round-trip with the next frames' dispatches while keeping
    # every decision data-driven (DeterministicPipeline; the strict
    # per-frame loop is the linearizeOperation semantics both implement)
    from ldso_tpu.system.pipeline import DeterministicPipeline
    spipe = DeterministicPipeline(fs, depth=3)
    # unmeasured warm pass: loads the lookahead driver's executables so all
    # three measured windows are load-free (the pipelined mode already does
    # this with n_pipe_warm)
    _drive(spipe, images[n_warm:n_warm + n_sync_warm],
           range(n_warm, n_warm + n_sync_warm), errors, "syncwarm")
    _retry(spipe.block_until_mapping_is_finished,
           label="syncwarm:drain", errors=errors)
    sync_base = n_warm + n_sync_warm
    sync_windows = []
    w = n_meas // 3
    for k in range(3):
        lo, hi = sync_base + k * w, sync_base + (k + 1) * w
        t0 = time.time()
        _drive(spipe, images[lo:hi], range(lo, hi), errors, f"sync{k}")
        _retry(spipe.block_until_mapping_is_finished,
               label=f"sync{k}:drain", errors=errors)
        sync_windows.append(w / max(time.time() - t0, 1e-9))
        result["sync_fps_windows"] = [round(x, 2) for x in sync_windows]
        if fs.is_lost:
            break
    n_done = len([f for f in fs.all_frames if f.id >= sync_base])
    fps = float(np.median(sync_windows))
    result["sync_fps"] = round(fps, 2)
    result["frames_measured"] = n_done

    # ---- pipelined mode: tracking overlaps mapping on its own thread, the
    # reference's actual run configuration (deliverTrackedFrame/mappingLoop,
    # FullSystem.cc:160-177,1809-1870); non-KFs may drop under load exactly
    # like the reference's catch-up logic -----------------------------------
    from ldso_tpu.system.pipeline import AsyncPipeline
    n_pw = n_meas                 # frames per measured pipelined window
    n_pipe_warm = 16              # unmeasured: compiles the pipelined-only
    n_piped = n_pipe_warm + 3 * n_pw   # executables (batched ingest chain,
    more = []                     # keyframe dispatch/finish split)
    for i in range(N, N + n_piped):
        t = np.array([0.03 * i, 0.01 * np.sin(0.2 * i), 0.004 * i])
        w = np.array([0.0, 0.0018 * i, 0.0004 * i])
        T_wc = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([t, w]))))
        poses.append(np.linalg.inv(T_wc))
        img, _ = scene.render(calib, jnp.asarray(poses[-1], jnp.float32))
        more.append(_quant8(img))
    try:
        pipe = AsyncPipeline(fs)
        _drive(pipe, more[:n_pipe_warm], range(N, N + n_pipe_warm),
               errors, "pipewarm")
        _retry(pipe.block_until_mapping_is_finished,
               label="pipewarm:drain", errors=errors)
    except Exception as e:  # noqa: BLE001 — warm-only
        if not _is_transient(e):
            raise
        errors.append(f"pipe warm window aborted: {type(e).__name__}")
    more = more[n_pipe_warm:]
    N += n_pipe_warm
    piped_windows = []
    baseline_fps = 18.5
    for wk in range(3):
        pipe = AsyncPipeline(fs)
        t0 = time.time()
        try:
            _drive(pipe, more[wk * n_pw:(wk + 1) * n_pw],
                   range(N + wk * n_pw, N + (wk + 1) * n_pw),
                   errors, f"piped{wk}")
            _retry(pipe.block_until_mapping_is_finished,
                   label=f"piped{wk}:drain", errors=errors)
        except Exception as e:  # noqa: BLE001 — keep windows measured so far
            if not _is_transient(e):
                raise
            errors.append(f"piped window {wk} aborted: {type(e).__name__}")
            break
        piped_windows.append(n_pw / max(time.time() - t0, 1e-9))
        # persist incrementally: the headline survives a later-mode crash
        piped_fps = float(np.median(piped_windows))
        result["value"] = round(piped_fps, 2)
        result["vs_baseline"] = round(piped_fps / baseline_fps, 3)
        result["piped_fps_windows"] = [round(x, 2) for x in piped_windows]
        if fs.is_lost:
            break

    # sanity: trajectory quality (similarity-aligned ATE) over the
    # synchronous portion (the pipelined extension drops frames
    # nondeterministically under load, exactly like the reference)
    N_sync = N - n_pipe_warm      # ATE over the synchronous region only
    try:
        est_ids = [f.id for f in fs.all_frames
                   if f.pose_valid and f.id < N_sync]
        est = [f.T_cw.copy() for f in fs.all_frames
               if f.pose_valid and f.id < N_sync]
        gt = [poses[i] for i in est_ids]
        est_c = np.stack([np.linalg.inv(T)[:3, 3] for T in est])
        gt_c = np.stack([np.linalg.inv(T)[:3, 3] for T in gt])
        ec = est_c - est_c.mean(0)
        gc = gt_c - gt_c.mean(0)
        s = np.sqrt((gc ** 2).sum() / max((ec ** 2).sum(), 1e-12))
        U, _, Vt = np.linalg.svd(ec.T @ gc)
        R = (U @ Vt).T
        ate = float(np.sqrt(np.mean(np.sum((gc - s * (ec @ R.T)) ** 2, 1))))
        result["ate_m_sim_aligned"] = round(ate, 5)
    except Exception:  # noqa: BLE001
        errors.append("ate computation failed")

    fails = getattr(fs, "trace_lane_transfer_failures", 0)
    if fails:
        result["trace_lane_transfer_failures"] = fails

    # ---- device utilization per hot program (VERDICT r3 #5): FLOPs and
    # bytes from XLA's own cost model (compiled.cost_analysis()) divided by
    # honestly-measured device time (chained-dependency slope; see
    # tools/profile_hot.chain_time — block_until_ready does NOT block over
    # the relay, so per-rep timing would measure dispatch, not compute) ----
    try:
        result["util"] = _bench_utilization(fs, calib, cfg)
    except Exception as e:  # noqa: BLE001 — observability must not kill fps
        errors.append(f"util section failed: {type(e).__name__}")

    # ---- aggregate multi-sequence VO: S complete pipelines share the chip,
    # dispatches interleave while each host thread waits on its own RPCs
    # (the single-chip analogue of BASELINE config[4]'s per-core replay) ----
    try:
        agg_fps = _bench_multi_sequence_vo(cfg, calib, scene)
        result["aggregate_vo_fps_8seq"] = round(agg_fps, 2)
    except Exception as e:  # noqa: BLE001 — optional mode
        if not _is_transient(e):
            raise
        errors.append(f"aggregate mode failed: {type(e).__name__}")
    try:
        agg16 = _bench_multi_sequence_vo(cfg, calib, scene, S=16,
                                         unique_seqs=8)
        result["aggregate_vo_fps_16seq"] = round(agg16, 2)
    except Exception as e:  # noqa: BLE001 — optional mode
        if not _is_transient(e):
            raise
        errors.append(f"aggregate16 mode failed: {type(e).__name__}")

    # ---- batched-throughput mode (BASELINE config[4]): many sequences in
    # lockstep through the tracking kernel — the TPU scaling axis ----------
    try:
        batched_fps, batched_util = _retry(_bench_batched_tracking,
                                           label="batched", errors=errors)
        result["batched_tracking_fps_16seq"] = round(batched_fps, 1)
        result.setdefault("util", {})["batched_track(16 seq)"] = batched_util
    except Exception as e:  # noqa: BLE001 — optional mode
        if not _is_transient(e):
            raise
        errors.append(f"batched mode failed: {type(e).__name__}")

    # ---- batched windowed-BA across sequences (VERDICT r4 #4): S complete
    # LM programs vmapped into one dispatch. The single-window program is
    # op-count-bound (hundreds of tiny ops per LM iteration, ~0.01% MXU);
    # vmapping batches every one of those ops across S windows at the SAME
    # op count, so per-sequence cost collapses — the per-chip number that
    # projects the aggregate-replay roofline ------------------------------
    try:
        ba_b = _retry(_bench_batched_ba, fs, calib, cfg, label="batched_ba",
                      errors=errors)
        result["batched_ba_8seq"] = ba_b
    except Exception as e:  # noqa: BLE001 — optional mode
        if not _is_transient(e):
            raise
        errors.append(f"batched BA mode failed: {type(e).__name__}")

    # measured: reference LDSO built from source and run on this container's
    # CPU (1x Xeon 2.10 GHz) over the SAME synthetic trajectory: 54.0 ms/f
    # pure DSO (BASELINE.md "Measured reference numbers").
    # headline = the pipelined (tracking thread + mapping thread) mode:
    # the reference's 18.5 fps was measured in ITS default threaded
    # configuration, so this is the apples-to-apples number. If no pipelined
    # window survived, fall back to the synchronous number so the round
    # still records a real fps.
    if not piped_windows and sync_windows:
        result["metric"] = "frames/sec synthetic 640x480 VO (sync fallback)"
        result["value"] = round(fps, 2)
        result["vs_baseline"] = round(fps / baseline_fps, 3)
    return 0


def _chain_slope(step, carry0, pull, n1=3, n2=23, reps=5):
    """Per-step device time (ms): time a data-dependent chain of n calls
    ending in a REAL host pull, at two lengths; the slope cancels the
    ~30 ms round-trip and its tunnel noise."""
    import time as _time

    def run(n):
        c = carry0
        t0 = _time.perf_counter()
        for _ in range(n):
            c = step(c)
        pull(c)
        return _time.perf_counter() - t0

    run(2)
    s = []
    for _ in range(reps):
        s.append((run(n2) - run(n1)) / (n2 - n1))
    return float(np.median(s)) * 1e3


# TPU v5e (v5 lite) single-chip peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM
_V5E_PEAK_FLOPS = 197e12
_V5E_HBM_BPS = 819e9


def _bench_utilization(fs, calib, cfg):
    """Per-hot-program {device ms, GFLOP, %MXU peak, GB/s, %HBM peak}.

    Replaces the reference's per-stage wall-clock log
    (run_dso_tum_mono.cc:428-460) with roofline accounting: XLA
    cost_analysis FLOPs/bytes over measured device time says whether each
    program is compute- or bandwidth- or latency-bound."""
    import jax
    import jax.numpy as jnp
    from ldso_tpu.ops.preprocess import make_pyramid, upload_image
    from ldso_tpu.system import full_system as fsm
    from ldso_tpu.frontend import immature

    out = {}
    fs.chain_reset()
    ref, ref_shell = fs._tracker_ref_pair
    if ref is None:
        ref, ref_shell = fs.tracker_ref, fs.tracker_ref_shell
    T_ref = jnp.asarray(ref_shell.T_cw, jnp.float32)
    img_dev = upload_image(_quant8(np.zeros((calib.h[0], calib.w[0]))))
    F = fs.ef.F
    dummies = (jnp.asarray(np.tile(np.eye(4), (F, 1, 1)), jnp.float32),
               jnp.zeros((F, 2), jnp.float32), jnp.ones((F,), jnp.float32))
    fs._refresh_trace_lanes()
    n_tr = fs._trace_lanes

    def costs(jitted, *args, **kw):
        """(FLOPs, min HBM bytes, XLA cost-model bytes).

        min bytes = unique input+output buffer sizes (every program must
        at least read its operands and write its results once); the XLA
        cost model's "bytes accessed" counts each gather as a full-operand
        read, so it overstates real HBM traffic by 10-100x on these
        gather-heavy programs (r4 fix: the raw number printed >200% of
        HBM peak)."""
        c = jitted.lower(*args, **kw).compile().cost_analysis()
        c = c[0] if isinstance(c, list) else c
        leaves = jax.tree_util.tree_leaves((args, kw))
        io = sum(x.size * x.dtype.itemsize for x in leaves
                 if hasattr(x, "dtype"))
        out_sh = jax.eval_shape(jitted, *args, **kw)
        io += sum(x.size * np.dtype(x.dtype).itemsize
                  for x in jax.tree_util.tree_leaves(out_sh))
        return (float(c.get("flops", 0.0)), float(io),
                float(c.get("bytes accessed", 0.0)))

    def record(name, t_ms, flops, io_bytes, xla_bytes):
        out[name] = dict(
            ms=round(t_ms, 2), gflop=round(flops / 1e9, 2),
            mxu_pct=round(100.0 * flops / (t_ms * 1e-3) / _V5E_PEAK_FLOPS, 2),
            io_gb=round(io_bytes / 1e9, 3),
            hbm_pct_min=round(
                100.0 * (io_bytes / (t_ms * 1e-3)) / _V5E_HBM_BPS, 1),
            xla_cost_gb=round(xla_bytes / 1e9, 2))

    # 1. the production per-frame chain program (pyramid + tracking LM)
    def frame_step(c):
        T0, aff0, rmse = fsm._chain_prep(c, T_ref)
        _, _, packed = fsm._frame_step(
            img_dev, fs.imm_arena, ref, T0, aff0, jnp.float32(1.0), rmse,
            T_ref, *dummies, fs.b_grad, False, calib, cfg,
            calib.levels - 1, n_trace=n_tr)
        return fsm._chain_update(c, packed, T0, T_ref)

    t = _chain_slope(frame_step, fs.track_chain,
                     lambda c: np.asarray(c.T_slast))
    T0, aff0, rmse = fsm._chain_prep(fs.track_chain, T_ref)
    fl, io, bt = costs(fsm._frame_step, img_dev, fs.imm_arena, ref, T0, aff0,
                   jnp.float32(1.0), rmse, T_ref, *dummies, fs.b_grad,
                   enable_trace=False, calib=calib, cfg=cfg,
                   coarsest=calib.levels - 1, n_trace=n_tr)
    record("frame_step(track)", t, fl, io, bt)

    # 2. the epipolar trace at the production lane bucket
    pyr_t = make_pyramid(img_dev, calib.levels, fs.b_grad)
    KRKis = jnp.asarray(np.tile(np.eye(3), (F, 1, 1)), jnp.float32)
    Kts = jnp.asarray(np.tile([0.02, 0.0, 0.001], (F, 1)), jnp.float32)
    affs = jnp.asarray(np.tile([1.0, 0.0], (F, 1)), jnp.float32)

    def trace_step(c):
        return (immature.trace_arena_sized(c[0], pyr_t.dI[0], KRKis, Kts,
                                           affs, calib, cfg, n_tr),)

    t = _chain_slope(trace_step, (fs.imm_arena,),
                     lambda c: np.asarray(c[0].pool.u[:1]))
    fl, io, bt = costs(immature.trace_arena_sized, fs.imm_arena, pyr_t.dI[0],
                   KRKis, Kts, affs, calib=calib, cfg=cfg, n=n_tr)
    record(f"trace({n_tr} lanes)", t, fl, io, bt)

    # 3. the whole windowed-BA LM device program
    from ldso_tpu.backend import ba_device
    from ldso_tpu.config import CPARS
    dIs = fs._dIs_stack()
    nf = len(fs.window_frames)
    n_full = CPARS + 8 * F
    HMp = np.zeros((n_full, n_full), np.float32)
    bMp = np.zeros(n_full, np.float32)
    n = CPARS + 8 * nf
    HMp[:n, :n] = fs.ef.HM
    bMp[:n] = fs.ef.bM
    HMj, bMj = jnp.asarray(HMp), jnp.asarray(bMp)

    def ba_step(c):
        W, _ = ba_device.optimize_device(c[0], dIs, HMj, bMj,
                                         jnp.int32(nf - 1), cfg,
                                         calib.w[0], calib.h[0],
                                         cfg.max_opt_iterations)
        return (W,)

    t = _chain_slope(ba_step, (fs.ef.W,),
                     lambda c: np.asarray(c[0].state[:1]), n1=2, n2=12)
    try:
        fl, io, bt = costs(ba_device.optimize_device, fs.ef.W, dIs, HMj, bMj,
                       jnp.int32(nf - 1), cfg=cfg, img_w=calib.w[0],
                       img_h=calib.h[0], max_iterations=cfg.max_opt_iterations)
        record("ba_lm", t, fl, io, bt)
    except Exception:  # noqa: BLE001 — keep the timing even without flops
        out["ba_lm"] = dict(ms=round(t, 2))
    return out


def _bench_multi_sequence_vo(cfg, calib, scene, S: int = 8,
                             n_warm: int = 16, n_meas: int = 24,
                             unique_seqs: int = 0) -> float:
    """S independent chain-pipelined systems processing S different
    sequences concurrently. Each pipeline's tracking side only queues
    dispatches (device-resident TrackChain), so the S tracking threads +
    S mapping threads keep the chip fed instead of each blocking on its
    own tunnel round-trips (measured: 4 sync systems 9-16 fps aggregate;
    8 chain pipelines saturate device time)."""
    import threading
    import jax.numpy as jnp
    from ldso_tpu.math import lie as _lie
    from ldso_tpu.system.full_system import FullSystem
    from ldso_tpu.system.pipeline import AsyncPipeline

    N = n_warm + n_meas
    # unique_seqs > 0 bounds the (tunnel-expensive) render cost: systems
    # beyond it replay a duplicate sequence — identical throughput load
    n_uniq = min(S, unique_seqs) if unique_seqs else S
    seq_images = []
    for sidx in range(n_uniq):
        imgs = []
        for i in range(N):
            t = np.array([0.03 * i, 0.01 * np.sin(0.2 * i + sidx), 0.004 * i])
            w = np.array([0.0, 0.0018 * i, 0.0004 * i + 0.0002 * sidx])
            T_wc = np.asarray(_lie.se3_exp(jnp.asarray(np.concatenate([t, w]))))
            img, _ = scene.render(calib, jnp.asarray(np.linalg.inv(T_wc),
                                                     jnp.float32))
            imgs.append(_quant8(img))
        seq_images.append(imgs)
    while len(seq_images) < S:
        seq_images.append(seq_images[len(seq_images) % n_uniq])

    systems = [FullSystem(calib, cfg) for _ in range(S)]

    def warm_range(fs, imgs, lo, hi):
        for i in range(lo, hi):
            try:
                _retry(fs.add_active_frame, imgs[i], i, 1.0, i * 0.05,
                       label=f"agg-warm{i}")
            except Exception as e:  # noqa: BLE001 — skip flaked frame
                if not _is_transient(e):
                    raise
            if fs.is_lost:
                break

    # warm all S systems concurrently (programs are compiled already)
    th = [threading.Thread(target=warm_range,
                           args=(systems[k], seq_images[k], 0, n_warm))
          for k in range(S)]
    [t.start() for t in th]
    [t.join() for t in th]

    def piped_range(pipe, imgs, lo, hi):
        for i in range(lo, hi):
            try:
                _retry(pipe.add_active_frame, imgs[i], i, 1.0, i * 0.05,
                       label=f"agg{i}")
            except Exception as e:  # noqa: BLE001 — skip flaked frame
                if not _is_transient(e):
                    raise
            if pipe.fs.is_lost:
                break
        pipe.block_until_mapping_is_finished()

    # 3 measured windows (median): each window drives all S pipelines over
    # a third of the measured range
    w = n_meas // 3
    windows = []
    for wk in range(3):
        lo, hi = n_warm + wk * w, n_warm + (wk + 1) * w
        pipes = [AsyncPipeline(fs) for fs in systems]
        before = sum(len([f for f in fs.all_frames if f.id >= n_warm])
                     for fs in systems)
        t0 = time.time()
        th = [threading.Thread(target=piped_range,
                               args=(pipes[k], seq_images[k], lo, hi))
              for k in range(S)]
        [t.start() for t in th]
        [t.join() for t in th]
        done = sum(len([f for f in fs.all_frames if f.id >= n_warm])
                   for fs in systems) - before
        windows.append(done / max(time.time() - t0, 1e-9))
    return float(np.median(windows))


def _bench_batched_tracking(B: int = 16, n_iters: int = 30) -> float:
    """Aggregate tracked frames/sec with B sequences in lockstep through the
    batched coarse-tracking kernel (parallel/replay.py; on a v5e-8 the batch
    axis shards over the mesh — here it exercises one chip)."""
    import jax
    import jax.numpy as jnp
    import time as _time
    from ldso_tpu.config import Config
    from ldso_tpu.frontend import tracker
    from ldso_tpu.math import lie
    from ldso_tpu.ops.preprocess import make_pyramid
    from ldso_tpu.synthetic import PlaneScene, default_calib

    cfg = Config()
    calib = default_calib(640, 480)
    scene = PlaneScene(freq_hi=25.0, contrast=80.0)
    img0, id0 = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
    pyr0 = make_pyramid(img0, calib.levels)
    ref = tracker.make_tracker_ref_from_idepth(
        id0, pyr0, calib, cfg.tracker_caps[:calib.levels], stride=2)
    T1 = lie.se3_exp(jnp.asarray([0.02, -0.01, 0.005, 0.002, 0.004, -0.001],
                                 jnp.float32))
    img1, _ = scene.render(calib, T1)
    pyr1 = make_pyramid(img1, calib.levels)

    refs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), ref)
    pyrs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), pyr1)
    T0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    aff0 = jnp.zeros((B, 2), jnp.float32)
    expo = jnp.ones((B,), jnp.float32)
    min_abort = jnp.full((B, calib.levels), 1e9, jnp.float32)

    coarsest = calib.levels - 1
    step = jax.jit(jax.vmap(
        lambda r, p, T, a, e, m: tracker.track_frame(
            r, p, T, a, e, m, calib, cfg, coarsest)))
    out = step(refs, pyrs, T0, aff0, expo, min_abort)
    np.asarray(out[0])  # block_until_ready does NOT block over the relay
    t0 = _time.time()
    for _ in range(n_iters):
        out = step(refs, pyrs, out[0], aff0, expo, min_abort)
    # a real host pull forces the whole dependent chain to finish; the
    # r1-r3 numbers used block_until_ready here, which returns before
    # execution completes over the axon relay and therefore measured
    # dispatch, not compute (methodology fix, round 4 — see BASELINE.md)
    np.asarray(out[0])
    dt = _time.time() - t0
    # MFU of the one program that should show real MXU numbers
    # (VERDICT r4 #4): XLA cost-model FLOPs over measured per-step time
    util = {}
    try:
        c = step.lower(refs, pyrs, T0, aff0, expo, min_abort)\
            .compile().cost_analysis()
        c = c[0] if isinstance(c, list) else c
        t_ms = dt / n_iters * 1e3
        fl = float(c.get("flops", 0.0))
        util = dict(ms=round(t_ms, 2), gflop=round(fl / 1e9, 2),
                    mxu_pct=round(100.0 * fl / (t_ms * 1e-3)
                                  / _V5E_PEAK_FLOPS, 2))
    except Exception:  # noqa: BLE001 — keep the fps even without flops
        pass
    return B * n_iters / dt, util


def _bench_batched_ba(fs, calib, cfg, S: int = 8):
    """Aggregate windowed-BA throughput: the production window broadcast to
    S sequences and the whole LM program vmapped into ONE dispatch —
    chain-slope timed. Returns {ms per batched call, ms per seq-KF,
    aggregate KF/s, MFU}. This is the 'batched windowed-BA across
    sequences' leg of the per-chip aggregate design (BASELINE config[4]);
    the single-window ba_lm is op-count-bound, so the vmapped batch
    amortizes the op overheads across S windows."""
    import jax
    import jax.numpy as jnp
    from ldso_tpu.backend import ba_device
    from ldso_tpu.config import CPARS

    dIs = fs._dIs_stack()
    nf = len(fs.window_frames)
    F = fs.ef.F
    n_full = CPARS + 8 * F
    HMp = np.zeros((n_full, n_full), np.float32)
    bMp = np.zeros(n_full, np.float32)
    n = CPARS + 8 * nf
    HMp[:n, :n] = fs.ef.HM
    bMp[:n] = fs.ef.bM

    # materialize the S-fold state ON DEVICE (one tile program; ~1 GB for
    # the S image stacks — 6% of a v5e's HBM)
    tile = jax.jit(lambda x: jnp.tile(x[None], (S,) + (1,) * x.ndim))
    W_b = jax.tree_util.tree_map(tile, fs.ef.W)
    dIs_b = tile(dIs)
    HM_b = tile(jnp.asarray(HMp))
    bM_b = tile(jnp.asarray(bMp))
    newest_b = jnp.full((S,), nf - 1, jnp.int32)

    step = jax.jit(jax.vmap(
        lambda W, d, HM, bM, ne: ba_device.optimize_device(
            W, d, HM, bM, ne, cfg, calib.w[0], calib.h[0],
            cfg.max_opt_iterations)[0]))

    def chain(c):
        return step(c, dIs_b, HM_b, bM_b, newest_b)

    t = _chain_slope(chain, W_b, lambda c: np.asarray(c.state[:1, :1]),
                     n1=2, n2=8)
    out = dict(S=S, ms=round(t, 2), ms_per_seq_kf=round(t / S, 2),
               agg_kf_per_sec=round(S / (t * 1e-3), 1))
    try:
        c = step.lower(W_b, dIs_b, HM_b, bM_b, newest_b)\
            .compile().cost_analysis()
        c = c[0] if isinstance(c, list) else c
        fl = float(c.get("flops", 0.0))
        out["gflop"] = round(fl / 1e9, 2)
        out["mxu_pct"] = round(100.0 * fl / (t * 1e-3) / _V5E_PEAK_FLOPS, 2)
    except Exception:  # noqa: BLE001
        pass
    return out


if __name__ == "__main__":
    sys.exit(main())
