"""ldso_tpu — a TPU-native direct visual SLAM framework (LDSO-class).

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of
tum-vision/LDSO (Direct Sparse Odometry with Sim(3) loop closure).
See SURVEY.md for the structural blueprint and reference citations.

Design stance (TPU-first, not a port):
  * All per-pixel / per-point / per-residual loops are batched array programs
    or Pallas kernels with *static shapes* (capacity-padded pools + masks).
  * Sequential decision logic (LM accept/reject, keyframe policy, window
    membership) lives either in `lax.while_loop`s inside one jitted program
    (hot paths) or in thin host orchestration between jitted steps.
  * float32 on device for all hot kernels; float64 only for the tiny stitched
    window solve and host-side pose bookkeeping (the reference stitches its
    Hessian in double: AccumulatedTopHessian.cc:144).
"""

import jax

# Dtype policy (verified on a real v5e chip):
#  * float64 does NOT compile on the TPU backend — all device code is
#    explicitly float32 (bfloat16 only inside validated kernels). The
#    reference's float64 Hessian stitching (AccumulatedTopHessian.cc:144)
#    is replaced by scale-balanced float32 accumulation on device plus
#    numpy float64 on host for the tiny stitched solves and pose
#    bookkeeping. jax x64 stays DISABLED so no accidental f64 reaches TPU.
#  * TPU matmuls default to bfloat16 passes, which costs ~3 digits on 4x4
#    pose chains and small Hessian algebra (measured: 6.3e-3 vs 3.9e-6
#    chain drift). Default to full-f32 matmul precision; throughput-bound
#    kernels opt down explicitly after validation.
jax.config.update("jax_default_matmul_precision", "highest")

# XLA's CPU compile passes recurse deeply enough to overflow the default
# 8 MB stack (observed as flaky SIGSEGVs inside backend_compile_and_load,
# both on worker threads and on the main thread). Raising the soft rlimit
# lets the main thread's stack grow past it; worker threads additionally
# get an explicit 64 MB stack where the package spawns them. 64 MB matches
# the explicitly-sized worker stacks (enough for the observed compile
# recursion) — on glibc the soft limit becomes the DEFAULT reservation for
# every thread created afterwards, so a larger value would multiply across
# XLA's thread pools.
try:
    import resource as _resource
    _soft, _hard = _resource.getrlimit(_resource.RLIMIT_STACK)
    _want = 64 * 1024 * 1024
    if _soft != _resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == _resource.RLIM_INFINITY else min(_want, _hard)
        _resource.setrlimit(_resource.RLIMIT_STACK, (_new, _hard))
except Exception:  # noqa: BLE001 (platform without resource / denied)
    pass

# Persistent compilation cache: the axon remote-compile path costs
# 30-120 s per program; caching compiled executables on disk makes every
# process after the first start in seconds.
import os as _os  # noqa: E402

# keyed by backend platform: executables AOT-compiled for another
# platform/host feature set can SIGSEGV on (de)serialization — the CPU
# backend here even crashes serializing its own executables, so the cache
# is only worth it for the slow remote-compile TPU path.
_platform_key = _os.environ.get("JAX_PLATFORMS", "auto").split(",")[0] or "auto"
_cache_dir = _os.environ.get("LDSO_TPU_JAX_CACHE",
                             _os.path.expanduser(
                                 f"~/.cache/ldso_tpu_jax_{_platform_key}"))
try:
    if _os.environ.get("LDSO_TPU_NO_COMPILE_CACHE") or _platform_key == "cpu":
        raise RuntimeError("compile cache disabled")
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001 (read-only fs etc.)
    pass

__version__ = "0.1.0"
