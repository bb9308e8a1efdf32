"""Loop-closing matcher tests: SearchByBoW node-bucketed matching
(reference src/frontend/FeatureMatcher.cc:66-124) and the projection
re-matching stage of ComputeOptimizedPose (LoopClosing.cc:343-405)."""

import numpy as np
import pytest

from ldso_tpu.loop import matcher


def _flip_bits(desc: np.ndarray, n_bits: int, rng) -> np.ndarray:
    """Flip n_bits random bits in each 256-bit (8x uint32) descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for b in rng.choice(256, n_bits, replace=False):
            out[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


class TestSearchByBoW:
    def test_native_matches_numpy_fallback(self):
        rng = np.random.RandomState(0)
        da = rng.randint(0, 2 ** 32, (90, 8), dtype=np.uint32)
        db = _flip_bits(da[:70], 6, rng)
        nodes_a = rng.randint(0, 12, 90).astype(np.int32)
        nodes_b = nodes_a[:70].copy()
        nodes_a[3] = -1  # unassigned features never match
        from ldso_tpu import native
        nm = native.bow_bucketed_match(da, nodes_a, db, nodes_b)
        if nm is None:
            pytest.skip("native toolchain unavailable")
        # force the numpy path by monkeying the native call away
        import unittest.mock as mock
        with mock.patch.object(native, "bow_bucketed_match",
                               lambda *a, **k: None):
            m_np = matcher.search_by_bow(da, nodes_a, db, nodes_b)
        np.testing.assert_array_equal(nm[0], m_np)
        assert nm[0][3] == -1

    def test_bucketing_blocks_cross_node_matches(self):
        rng = np.random.RandomState(1)
        da = rng.randint(0, 2 ** 32, (20, 8), dtype=np.uint32)
        db = _flip_bits(da, 4, rng)
        nodes_a = np.arange(20, dtype=np.int32)
        nodes_b = (np.arange(20, dtype=np.int32) + 1) % 20  # all disjoint
        m = matcher.search_by_bow(da, nodes_a, db, nodes_b)
        assert (m == -1).all()

    def test_quality_vs_brute_force(self):
        """The direct-index bucketing is what makes matching robust at
        scale (SURVEY C21): near-duplicate distractors in OTHER vocabulary
        nodes kill brute-force NN-ratio matches but leave the bucketed
        matcher untouched."""
        rng = np.random.RandomState(2)
        n = 60
        da = rng.randint(0, 2 ** 32, (n, 8), dtype=np.uint32)
        true_b = _flip_bits(da, 8, rng)              # the true partners
        distract = _flip_bits(da, 10, rng)           # near-duplicates:
        # d_true=8 vs d_distractor<=10 fails the 0.75 NN-ratio brute-force
        db = np.concatenate([true_b, distract])
        nodes_a = rng.randint(0, 6, n).astype(np.int32)
        nodes_b = np.concatenate([nodes_a,           # true: same node
                                  (nodes_a + 3) % 6])  # distractors: other
        m_bow = matcher.search_by_bow(da, nodes_a, db, nodes_b)
        correct_bow = int(np.sum(m_bow == np.arange(n)))

        # brute force with the same NN-ratio/threshold semantics
        d = matcher.hamming_matrix_np(da, db)
        order = np.argsort(d, axis=1)
        d1 = d[np.arange(n), order[:, 0]]
        d2 = d[np.arange(n), order[:, 1]]
        ok = (d1 <= matcher.TH_LOW) & (d1 < matcher.NN_RATIO * d2)
        m_bf = np.where(ok, order[:, 0], -1)
        correct_bf = int(np.sum(m_bf == np.arange(n)))

        assert correct_bow >= 0.9 * n
        assert correct_bow > correct_bf, (
            f"bucketed {correct_bow} should beat brute force {correct_bf}")

    def test_node_ids_bucketing(self):
        import jax.numpy as jnp
        from ldso_tpu.loop.vocab import Vocabulary
        rng = np.random.RandomState(3)
        descs = rng.randint(0, 2 ** 32, (200, 8), dtype=np.uint32)
        voc = Vocabulary.train(descs, k=4, L=3)
        wids = np.asarray(voc.transform(jnp.asarray(descs),
                                        jnp.ones(len(descs), bool)))
        # levelsup >= L buckets everything at the root
        root = voc.node_ids(wids, levelsup=voc.L)
        assert (root[wids >= 0] == 0).all()
        # levelsup=1: at most k^(L-1) distinct buckets, none at the root
        n1 = voc.node_ids(wids, levelsup=1)
        n1v = n1[wids >= 0]
        assert len(np.unique(n1v)) <= voc.k ** (voc.L - 1)
        assert (n1v > 0).all()
        # identical words land in identical buckets
        same = wids[:1] == wids
        assert len(np.unique(n1[same & (wids >= 0)])) <= 1
        # invalid words stay -1
        assert voc.node_ids(np.array([-1]), levelsup=1)[0] == -1


class TestSearchByProjection:
    def _geometry(self, rng, n=50):
        fx = fy = 250.0
        cx, cy = 160.0, 120.0
        z = 2.0 + rng.rand(n) * 3.0
        u = rng.rand(n) * 300 + 10
        v = rng.rand(n) * 220 + 10
        P = np.stack([(u - cx) / fx * z, (v - cy) / fy * z, z], 1)
        return (fx, fy, cx, cy), P, np.stack([u, v], 1)

    def test_projection_matching_recovers_correspondences(self):
        rng = np.random.RandomState(4)
        K, P_ref, uv_cur = self._geometry(rng)
        n = len(P_ref)
        desc = rng.randint(0, 2 ** 32, (n, 8), dtype=np.uint32)
        angle = rng.rand(n).astype(np.float32) * 2 - 1
        idep = (1.0 / P_ref[:, 2]).astype(np.float32)
        m = matcher.search_by_projection(
            P_ref, desc, angle, np.eye(4), uv_cur.astype(np.float32),
            desc, angle, idep, K, window_size=5.0)
        assert (m == np.arange(n)).mean() > 0.9

    def test_idepth_gate_and_rotation_check(self):
        rng = np.random.RandomState(5)
        K, P_ref, uv_cur = self._geometry(rng, 30)
        n = len(P_ref)
        desc = rng.randint(0, 2 ** 32, (n, 8), dtype=np.uint32)
        angle = np.zeros(n, np.float32)
        idep = (1.0 / P_ref[:, 2]).astype(np.float32)
        # idepth gate: features without window depth never match
        idep_g = idep.copy()
        idep_g[:10] = -1.0
        m = matcher.search_by_projection(
            P_ref, desc, angle, np.eye(4), uv_cur.astype(np.float32),
            desc, angle, idep_g, K)
        assert (m[:10] == -1).all()
        # rotation check: incompatible orientation rejects (|diff| >= 0.2,
        # LoopClosing.cc:367)
        ang_bad = angle + 0.5
        m2 = matcher.search_by_projection(
            P_ref, desc, angle, np.eye(4), uv_cur.astype(np.float32),
            desc, ang_bad, idep, K)
        assert (m2 == -1).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
