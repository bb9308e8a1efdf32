"""Immature-point tests: epipolar trace on synthetic translation
(SURVEY.md §4 seam "epipolar trace on synthetic translation")."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import Config
from ldso_tpu.frontend import immature
from ldso_tpu.math import lie
from ldso_tpu.ops.preprocess import make_pyramid
from ldso_tpu.synthetic import PlaneScene, default_calib

CFG = Config()


def _setup(w=256, h=192):
    calib = default_calib(w, h)
    scene = PlaneScene(freq_hi=40.0, contrast=70.0)
    img0, id0 = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
    pyr0 = make_pyramid(img0, calib.levels)
    return calib, scene, img0, id0, pyr0


def _grid_status(w, h, step=16):
    st = np.zeros((h, w), np.int32)
    st[8:-8:step, 8:-8:step] = 1
    return jnp.asarray(st)


class TestPool:
    def test_make_pool(self):
        calib, scene, img0, id0, pyr0 = _setup()
        status = _grid_status(calib.w[0], calib.h[0])
        pool = immature.make_pool(status, pyr0.dI[0], 512, CFG)
        n = int(pool.valid.sum())
        assert n == int((np.asarray(status) != 0).sum())
        assert np.all(np.asarray(pool.status)[np.asarray(pool.valid)]
                      == immature.IPS_UNINITIALIZED)
        w = np.asarray(pool.weights)[np.asarray(pool.valid)]
        assert np.all((w > 0) & (w <= 1.0))


class TestTrace:
    def _trace_once(self, xi, pool, pyr_t, calib):
        T = lie.se3_exp(jnp.asarray(xi, jnp.float64)).astype(jnp.float32)
        K = jnp.asarray(calib.K(0), jnp.float32)
        Ki = jnp.asarray(calib.Ki(0), jnp.float32)
        KRKi = K @ T[:3, :3] @ Ki
        Kt = K @ T[:3, 3]
        aff = jnp.array([1.0, 0.0], jnp.float32)
        return immature.trace(pool, pyr_t.dI[0], KRKi, Kt, aff, calib, CFG)

    def test_interval_narrows_to_truth(self):
        calib, scene, img0, id0, pyr0 = _setup()
        status = _grid_status(calib.w[0], calib.h[0])
        pool = immature.make_pool(status, pyr0.dI[0], 512, CFG)

        xi = [0.08, 0.0, 0.0, 0.0, 0.0, 0.0]  # pure lateral baseline
        T = lie.se3_exp(jnp.asarray(xi)).astype(jnp.float32)
        img1, _ = scene.render(calib, T)
        pyr1 = make_pyramid(img1, calib.levels)
        pool = self._trace_once(xi, pool, pyr1, calib)

        st = np.asarray(pool.status)
        valid = np.asarray(pool.valid)
        good = valid & (st == immature.IPS_GOOD)
        assert good.sum() > 0.5 * valid.sum(), f"too few good traces: {good.sum()}/{valid.sum()}"

        # true idepth inside the (narrowed) interval for good traces
        u = np.asarray(pool.u)[good].astype(int)
        v = np.asarray(pool.v)[good].astype(int)
        true_id = np.asarray(id0)[v, u]
        lo = np.asarray(pool.idepth_min)[good]
        hi = np.asarray(pool.idepth_max)[good]
        inside = (true_id >= lo - 0.02) & (true_id <= hi + 0.02)
        assert inside.mean() > 0.9, f"only {inside.mean():.2%} intervals contain truth"
        assert np.isfinite(hi).all()
        assert (hi - lo).mean() < 1.0

    def test_second_trace_narrows_further(self):
        calib, scene, img0, id0, pyr0 = _setup()
        status = _grid_status(calib.w[0], calib.h[0])
        pool = immature.make_pool(status, pyr0.dI[0], 512, CFG)

        for i, bx in enumerate([0.06, 0.1]):
            xi = [bx, 0.01, 0.0, 0.0, 0.0, 0.0]
            img, _ = scene.render(calib, lie.se3_exp(jnp.asarray(xi)).astype(jnp.float32))
            pyr = make_pyramid(img, calib.levels)
            pool = self._trace_once(xi, pool, pyr, calib)
            width = np.asarray(pool.idepth_max - pool.idepth_min)
            good = np.asarray(pool.valid) & (np.asarray(pool.status) == immature.IPS_GOOD)
            if i == 0:
                w_first = width[good].mean()
        w_second = width[good].mean()
        assert w_second <= w_first * 1.1

    def test_zero_baseline_skips(self):
        """No translation => no epipolar line => traces cannot converge
        (either SKIPPED via tiny interval once initialized, or remain wide)."""
        calib, scene, img0, id0, pyr0 = _setup()
        status = _grid_status(calib.w[0], calib.h[0])
        pool = immature.make_pool(status, pyr0.dI[0], 512, CFG)
        pool = self._trace_once([0, 0, 0, 0, 0.002, 0], pool, pyr0, calib)
        # pure rotation: intervals must not collapse to a spurious depth
        good = np.asarray(pool.valid) & (np.asarray(pool.status) == immature.IPS_GOOD)
        if good.sum() > 0:
            # any "good" trace must still have a huge relative interval
            rel = (np.asarray(pool.idepth_max) - np.asarray(pool.idepth_min))[good]
            assert np.median(rel) > 0.5


class TestActivate:
    def test_activation_recovers_depth(self):
        calib, scene, img0, id0, pyr0 = _setup()
        status = _grid_status(calib.w[0], calib.h[0])
        pool = immature.make_pool(status, pyr0.dI[0], 512, CFG)

        # two target frames with baselines
        Rs, ts, affs, dIs, masks = [], [], [], [], []
        for xi in ([0.07, 0.0, 0.0, 0, 0, 0], [0.0, 0.06, 0.01, 0, 0, 0]):
            T = lie.se3_exp(jnp.asarray(xi)).astype(jnp.float32)
            img, _ = scene.render(calib, T)
            pyr = make_pyramid(img, calib.levels)
            Rs.append(T[:3, :3])
            ts.append(T[:3, 3])
            affs.append(jnp.array([1.0, 0.0], jnp.float32))
            dIs.append(pyr.dI[0])
            masks.append(True)

        u, v = pool.u, pool.v
        true_id = jnp.asarray(np.asarray(id0)[np.asarray(v).astype(int),
                                              np.asarray(u).astype(int)])
        idepth0 = true_id * 1.3  # 30% off initial guess
        idep, ok, n_good, st = immature.activate(
            u, v, pool.color, pool.weights, pool.energy_th, idepth0, pool.valid,
            jnp.stack(Rs), jnp.stack(ts), jnp.stack(affs), jnp.asarray(masks),
            jnp.stack(dIs), calib, CFG)
        okm = np.asarray(ok) & np.asarray(pool.valid)
        assert okm.sum() > 0.5 * int(pool.valid.sum())
        err = np.abs(np.asarray(idep)[okm] - np.asarray(true_id)[okm]) / np.asarray(true_id)[okm]
        assert np.median(err) < 0.02, f"median idepth error {np.median(err):.3f}"
        assert (np.asarray(n_good)[okm] >= 1).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestArena:
    """Flat candidate arena: allocation, host gathers, marginalization."""

    def _mini_pool(self, n_valid, cap=8, seed=0):
        import jax.numpy as jnp
        from ldso_tpu.frontend import immature
        rng = np.random.RandomState(seed)
        z = lambda *s: jnp.asarray(rng.rand(cap, *s).astype(np.float32))
        valid = jnp.asarray(np.arange(cap) < n_valid)
        return immature.ImmaturePool(
            u=z(), v=z(), valid=valid, color=z(8), weights=z(8),
            gradH=z(2, 2), idepth_min=z(),
            idepth_max=jnp.full(cap, np.inf, jnp.float32),
            quality=z(), energy_th=z(),
            status=jnp.full(cap, immature.IPS_UNINITIALIZED, jnp.int32),
            last_u=z(), last_v=z(), last_interval=z(),
            my_type=jnp.ones(cap, jnp.int32))

    def test_add_counts_and_shift(self):
        import jax.numpy as jnp
        from ldso_tpu.config import Config
        from ldso_tpu.frontend import immature
        cfg = Config()
        arena = immature.empty_arena(32, cfg)
        arena = immature.arena_add(arena, self._mini_pool(5, seed=1), 0)
        arena = immature.arena_add(arena, self._mini_pool(3, seed=2), 2)
        counts = np.asarray(immature.arena_counts(arena, 4))
        np.testing.assert_array_equal(counts, [5, 0, 3, 0])
        # marginalize slot 0: its candidates die, host 2 renumbers to 1
        arena = immature.arena_marg_shift(arena, jnp.int32(0))
        counts = np.asarray(immature.arena_counts(arena, 4))
        np.testing.assert_array_equal(counts, [0, 3, 0, 0])

    def test_overflow_drops(self):
        from ldso_tpu.config import Config
        from ldso_tpu.frontend import immature
        cfg = Config()
        arena = immature.empty_arena(6, cfg)
        arena = immature.arena_add(arena, self._mini_pool(5, seed=1), 0)
        arena = immature.arena_add(arena, self._mini_pool(4, seed=2), 1)
        counts = np.asarray(immature.arena_counts(arena, 2))
        assert counts[0] == 5 and counts[1] == 1  # overflow dropped, no alias

    def test_trace_arena_matches_shared(self):
        """Per-candidate-transform trace == shared-transform trace when all
        candidates share one host."""
        import jax.numpy as jnp
        from ldso_tpu.config import Config
        from ldso_tpu.frontend import immature
        from ldso_tpu.synthetic import PlaneScene, default_calib
        from ldso_tpu.ops.preprocess import make_pyramid
        from ldso_tpu.math import lie
        cfg = Config()
        calib = default_calib(128, 96)
        scene = PlaneScene(freq_hi=25.0, contrast=80.0)
        img0, _ = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
        T1 = np.asarray(lie.se3_exp(jnp.asarray(
            [0.05, 0.0, 0.01, 0.0, 0.01, 0.0], jnp.float32)))
        img1, _ = scene.render(calib, jnp.asarray(T1, jnp.float32))
        pyr0 = make_pyramid(img0, calib.levels)
        pyr1 = make_pyramid(img1, calib.levels)
        status = np.zeros((96, 128), np.int32)
        rng = np.random.RandomState(0)
        status[rng.randint(10, 86, 50), rng.randint(10, 118, 50)] = 1
        pool = immature.make_pool(jnp.asarray(status), pyr0.dI[0], 64, cfg)
        K = calib.K(0)
        Ki = calib.Ki(0)
        KRKi = jnp.asarray(K @ T1[:3, :3] @ Ki, jnp.float32)
        Kt = jnp.asarray(K @ T1[:3, 3], jnp.float32)
        aff = jnp.asarray([1.0, 0.0], jnp.float32)
        ref = immature.trace(pool, pyr1.dI[0], KRKi, Kt, aff, calib, cfg)

        arena = immature.empty_arena(64, cfg)
        arena = immature.arena_add(arena, pool, 0)
        KRKis = jnp.stack([KRKi, jnp.eye(3, dtype=jnp.float32)])
        Kts = jnp.stack([Kt, jnp.zeros(3, jnp.float32)])
        affs = jnp.stack([aff, aff])
        out = immature.trace_arena(arena, pyr1.dI[0], KRKis, Kts, affs,
                                   calib, cfg)
        # arena_add packs valid candidates first, in order
        nv = int(np.asarray(pool.valid).sum())
        order = np.nonzero(np.asarray(pool.valid))[0]
        np.testing.assert_allclose(np.asarray(out.pool.idepth_min)[:nv],
                                   np.asarray(ref.idepth_min)[order],
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out.pool.status)[:nv],
                                      np.asarray(ref.status)[order])


class TestArenaCompactAndSizedTrace:
    """arena_compact + trace_arena_sized: the per-frame trace bucket path."""

    def _arena_with_holes(self, cfg):
        calib, scene, img0, id0, pyr0 = _setup(128, 96)
        status = np.zeros((96, 128), np.int32)
        rng = np.random.RandomState(1)
        status[rng.randint(10, 86, 60), rng.randint(10, 118, 60)] = 1
        pool = immature.make_pool(jnp.asarray(status), pyr0.dI[0], 64, cfg)
        arena = immature.empty_arena(256, cfg)
        arena = immature.arena_add(arena, pool, 0)
        # punch holes so the live set is non-contiguous
        kill = np.zeros(256, bool)
        kill[::3] = True
        arena = immature.arena_mask(arena, jnp.asarray(kill))
        return calib, scene, arena

    def test_compact_preserves_live_set_as_prefix(self):
        cfg = Config()
        calib, scene, arena = self._arena_with_holes(cfg)
        live_before = np.asarray(arena.pool.valid & (arena.host >= 0))
        keys_before = sorted(zip(
            np.asarray(arena.pool.u)[live_before].tolist(),
            np.asarray(arena.pool.v)[live_before].tolist(),
            np.asarray(arena.host)[live_before].tolist()))
        out = immature.arena_compact(arena)
        live = np.asarray(out.pool.valid & (out.host >= 0))
        n = live.sum()
        assert n == live_before.sum()
        assert live[:n].all() and not live[n:].any(), "live set not a prefix"
        keys_after = sorted(zip(
            np.asarray(out.pool.u)[live].tolist(),
            np.asarray(out.pool.v)[live].tolist(),
            np.asarray(out.host)[live].tolist()))
        assert keys_before == keys_after

    def test_sized_trace_matches_full(self):
        cfg = Config()
        calib, scene, arena = self._arena_with_holes(cfg)
        arena = immature.arena_compact(arena)
        T1 = np.asarray(lie.se3_exp(jnp.asarray(
            [0.05, 0.0, 0.01, 0.0, 0.01, 0.0], jnp.float32)))
        img1, _ = scene.render(calib, jnp.asarray(T1, jnp.float32))
        pyr1 = make_pyramid(img1, calib.levels)
        K, Ki = calib.K(0), calib.Ki(0)
        KRKi = jnp.asarray(K @ T1[:3, :3] @ Ki, jnp.float32)
        Kt = jnp.asarray(K @ T1[:3, 3], jnp.float32)
        aff = jnp.asarray([1.0, 0.0], jnp.float32)
        KRKis = jnp.broadcast_to(KRKi, (2, 3, 3))
        Kts = jnp.broadcast_to(Kt, (2, 3))
        affs = jnp.broadcast_to(aff, (2, 2))
        full = immature.trace_arena(arena, pyr1.dI[0], KRKis, Kts, affs,
                                    calib, cfg)
        wm = int(np.asarray(immature.arena_counts_and_watermark(arena, 2))[2])
        n = 64 if wm <= 64 else 256
        sized = immature.trace_arena_sized(arena, pyr1.dI[0], KRKis, Kts,
                                           affs, calib, cfg, n)
        np.testing.assert_allclose(np.asarray(sized.pool.idepth_min),
                                   np.asarray(full.pool.idepth_min),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(sized.pool.status),
                                      np.asarray(full.pool.status))
        np.testing.assert_array_equal(np.asarray(sized.host),
                                      np.asarray(full.host))


class TestIntegerImagePyramid:
    def test_u8_u16_match_f32(self):
        from ldso_tpu.ops.preprocess import make_pyramid as mp
        rng = np.random.RandomState(0)
        img = (rng.rand(64, 96) * 255.0).astype(np.float32)
        img8 = np.round(img).astype(np.uint8)
        img16 = np.round(img * 256.0).astype(np.uint16)
        p32 = mp(jnp.asarray(img), 2)
        p8 = mp(jnp.asarray(img8), 2)
        p16 = mp(jnp.asarray(img16), 2)
        assert np.max(np.abs(np.asarray(p8.dI[0][..., 0])
                             - np.asarray(p32.dI[0][..., 0]))) <= 0.5 + 1e-5
        assert np.max(np.abs(np.asarray(p16.dI[0][..., 0])
                             - np.asarray(p32.dI[0][..., 0]))) <= (1/256) + 1e-5
