"""Parity tests for the packed-tap bilinear gather (ops/interp.py).

The packed formulation must be bit-identical to the 4-tap `bilinear`
(both implement getInterpolatedElement's factorization,
GlobalFuncs.h:55-67) — the tracker/BA hot paths switch between them by
a perf flag, so any numeric divergence would silently change
trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.ops.interp import (bilinear, bilinear_packed,
                                 bilinear_packed_frames, pack_taps)

pytestmark = pytest.mark.smoke


def _coords(rng, n, w, h):
    # include exact-integer, border and out-of-range coords (clamped paths)
    x = rng.uniform(-2, w + 2, n).astype(np.float32)
    y = rng.uniform(-2, h + 2, n).astype(np.float32)
    x[:4] = [0.0, w - 1.0, 3.0, w - 1.5]
    y[:4] = [0.0, h - 1.0, 7.0, h - 1.5]
    return jnp.asarray(x), jnp.asarray(y)


def test_packed_matches_bilinear_multichannel():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(37, 53, 3)).astype(np.float32))
    x, y = _coords(rng, 257, 53, 37)
    ref = bilinear(img, x, y)
    packed = pack_taps(img)
    assert packed.shape == (37, 53, 12)
    out = bilinear_packed(packed, x, y, channels=3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_packed_matches_bilinear_single_channel():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(24, 40)).astype(np.float32))
    x, y = _coords(rng, 65, 40, 24)
    ref = bilinear(img, x, y)
    out = bilinear_packed(pack_taps(img), x, y, channels=1)[..., 0]
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_packed_frames_matches_per_frame():
    rng = np.random.default_rng(2)
    F, H, W = 4, 19, 31
    imgs = rng.normal(size=(F, H, W, 3)).astype(np.float32)
    packed = jnp.stack([pack_taps(jnp.asarray(imgs[f])) for f in range(F)])
    x, y = _coords(rng, 97, W, H)
    fidx = jnp.asarray(rng.integers(0, F, 97), jnp.int32)
    out = bilinear_packed_frames(packed, fidx, x, y, channels=3)
    for f in range(F):
        m = np.asarray(fidx) == f
        ref = bilinear(jnp.asarray(imgs[f]), x[m], y[m])
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out)[m])


def test_pattern_packed_matches_per_tap_nearest():
    """nearest_packed_pattern == per-tap nearest for the integer residual
    pattern (round(x + k) == round(x) + k for integer k), away from the
    border where the packed image edge-clamps per tap."""
    from ldso_tpu.config import PATTERN
    from ldso_tpu.ops.interp import nearest, nearest_packed_pattern, \
        pack_pattern

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(33, 47)).astype(np.float32))
    x = jnp.asarray(rng.uniform(3, 43, 129).astype(np.float32))
    y = jnp.asarray(rng.uniform(3, 29, 129).astype(np.float32))
    packed = pack_pattern(img, PATTERN)
    assert packed.shape == (33, 47, 8)
    out = nearest_packed_pattern(packed, x, y)
    for p, (dx, dy) in enumerate(np.asarray(PATTERN)):
        ref = nearest(img, x + float(dx), y + float(dy))
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out)[:, p])


def test_pattern_packed_bilinear_matches_per_tap():
    """bilinear_packed_pattern == per-tap bilinear at the integer pattern
    (all taps share the sample's fractional part), bit-exact away from
    the border clamp."""
    from ldso_tpu.config import PATTERN
    from ldso_tpu.ops.interp import (bilinear_packed_pattern,
                                     pack_pattern_bilinear)

    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.normal(size=(29, 41)).astype(np.float32))
    x = jnp.asarray(rng.uniform(3, 36, (7, 19)).astype(np.float32))
    y = jnp.asarray(rng.uniform(3, 24, (7, 19)).astype(np.float32))
    packed = pack_pattern_bilinear(img, PATTERN)
    assert packed.shape == (29, 41, 32)
    out = bilinear_packed_pattern(packed, x, y, PATTERN.shape[0])
    assert out.shape == (7, 19, 8)
    for p, (dx, dy) in enumerate(np.asarray(PATTERN)):
        ref = bilinear(img, x + float(dx), y + float(dy))
        # per-tap bilinear recomputes frac(x + k) in f32, losing up to
        # ulp(x) ~ 4e-6 px of the fraction at x ~ 40 (6e-5 px at x ~ 640);
        # the packed form reuses frac(x) for every tap (more consistent)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out)[..., p],
                                   rtol=0, atol=1e-5)


def test_packed_under_jit_and_grad_free_path():
    # the hot paths run under jit; make sure tracing the packed gather is
    # fine. Under jit XLA may contract the tap-combine into FMAs with a
    # different association than eager, so allow 1-ulp here (the eager
    # tests above are bit-exact).
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(16, 16, 3)).astype(np.float32))
    x, y = _coords(rng, 33, 16, 16)

    @jax.jit
    def f(img, x, y):
        return bilinear_packed(pack_taps(img), x, y, channels=3)

    np.testing.assert_allclose(np.asarray(bilinear(img, x, y)),
                               np.asarray(f(img, x, y)), rtol=5e-7, atol=5e-7)
