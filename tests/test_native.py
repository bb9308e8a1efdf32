"""Native C++ runtime tests: parity with the python/device implementations."""

import numpy as np
import pytest

from ldso_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNative:
    def test_builds(self, lib):
        assert lib is not None

    def test_bow_transform_matches_device(self, lib):
        import jax.numpy as jnp
        from ldso_tpu.loop.vocab import Vocabulary
        rng = np.random.RandomState(0)
        descs = rng.randint(0, 2 ** 32, (120, 8), dtype=np.uint32)
        voc = Vocabulary.train(descs, k=4, L=2)
        dev = voc.transform(jnp.asarray(descs), jnp.ones(len(descs), bool))
        nat = native.bow_transform(descs, voc.node_desc, voc.children,
                                   voc.word_id, voc.k, voc.L)
        np.testing.assert_array_equal(nat, dev)

    def test_hamming_match_matches_device(self, lib):
        import jax.numpy as jnp
        from ldso_tpu.frontend import detector
        rng = np.random.RandomState(1)
        da = rng.randint(0, 2 ** 32, (40, 8), dtype=np.uint32)
        db = rng.randint(0, 2 ** 32, (60, 8), dtype=np.uint32)
        db[5] = da[3]  # exact match
        m_dev, d_dev = detector.match_descriptors(
            jnp.asarray(da), jnp.ones(40, bool),
            jnp.asarray(db), jnp.ones(60, bool))
        m_nat, d_nat = native.hamming_match(da, db)
        np.testing.assert_array_equal(m_nat, np.asarray(m_dev))
        np.testing.assert_array_equal(d_nat, np.asarray(d_dev))

    def test_database_matches_python(self, lib):
        from ldso_tpu.loop.database import KeyframeDatabase
        from ldso_tpu.loop.vocab import Vocabulary
        rng = np.random.RandomState(2)
        descs = rng.randint(0, 2 ** 32, (150, 8), dtype=np.uint32)
        voc = Vocabulary.train(descs, k=5, L=2)
        import jax.numpy as jnp

        db_n = KeyframeDatabase(voc)
        db_p = KeyframeDatabase(voc)
        db_p._native = None  # force python path
        groups = [descs[i * 30:(i + 1) * 30] for i in range(5)]
        for i, g in enumerate(groups):
            w = voc.transform(jnp.asarray(g), jnp.ones(len(g), bool))
            bow = voc.bow_vector(w)
            db_n.add(i, bow)
            db_p.add(i, bow)
        q = groups[3]
        wq = voc.transform(jnp.asarray(q), jnp.ones(len(q), bool))
        bq = voc.bow_vector(wq)
        rn = db_n.query(bq, exclude={4})
        rp = db_p.query(bq, exclude={4})
        assert rn[0][0] == rp[0][0] == 3
        np.testing.assert_allclose(rn[0][1], rp[0][1], rtol=1e-5)

    def test_radius_nms(self, lib):
        u = np.array([0.0, 1.0, 10.0, 10.5, 30.0], np.float32)
        v = np.array([0.0, 1.0, 10.0, 10.0, 30.0], np.float32)
        s = np.array([5.0, 9.0, 3.0, 4.0, 1.0], np.float32)
        keep = native.radius_nms(u, v, s, 5.0)
        # highest in each cluster survives
        assert keep.tolist() == [False, True, False, True, True]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
