"""DBoW3 binary vocabulary format: round-trip + QuickLZ decompressor parity.

The QuickLZ oracle test compiles the reference's vendored quicklz.c
(read-only, used as a black-box compressor) and checks our pure-Python
decompressor inverts it bit-exactly; it is skipped when the reference
tree or a C compiler is unavailable.
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from ldso_tpu.loop import qlz
from ldso_tpu.loop.vocab import Vocabulary

_QLZ_SRC = "/root/reference/thirdparty/DBoW3/src/quicklz.c"


def _train_vocab(seed=0, n=400):
    rng = np.random.RandomState(seed)
    desc = rng.randint(0, 2 ** 32, size=(n, 8), dtype=np.uint64).astype(np.uint32)
    v = Vocabulary.train(desc, k=4, L=3, seed=seed)
    v.set_idf_weights([np.arange(v.n_words) % max(v.n_words, 1)
                       for _ in range(3)])
    return v, desc


def test_binary_roundtrip(tmp_path):
    v, desc = _train_vocab()
    path = str(tmp_path / "voc.dbow3")
    v.save_binary(path)
    w = Vocabulary.load(path)          # load() must sniff binary
    assert w.k == v.k and w.L == v.L and w.n_words == v.n_words
    np.testing.assert_array_equal(w.node_desc, v.node_desc)
    np.testing.assert_array_equal(w.children, v.children)
    np.testing.assert_array_equal(w.is_leaf, v.is_leaf)
    np.testing.assert_array_equal(w.word_id, v.word_id)
    np.testing.assert_allclose(w.word_weight, v.word_weight, rtol=1e-6)
    # identical word assignment for fresh descriptors
    import jax.numpy as jnp
    valid = jnp.ones(len(desc), bool)
    np.testing.assert_array_equal(v.transform(jnp.asarray(desc), valid),
                                  w.transform(jnp.asarray(desc), valid))


def test_binary_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.dbow3")
    with open(path, "wb") as f:
        f.write(struct.pack("<QBI", 1234, 0, 7))
    with pytest.raises(ValueError):
        Vocabulary.load_binary(path)


@pytest.fixture(scope="module")
def qlz_tool(tmp_path_factory):
    if not os.path.exists(_QLZ_SRC) or shutil.which("g++") is None:
        pytest.skip("reference quicklz.c or g++ unavailable")
    d = tmp_path_factory.mktemp("qlz")
    drv = d / "drv.c"
    # black-box driver: stdin -> chunked qlz_compress -> stdout, mirroring
    # Vocabulary::toStream's 10000-byte chunking (no reference code copied)
    drv.write_text(r"""
#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include "quicklz.h"
int main(int argc, char** argv) {
    int chunk = atoi(argv[1]);
    static qlz_state_compress st;
    char *in = malloc(chunk), *out = malloc(chunk + 400);
    size_t n;
    while ((n = fread(in, 1, chunk, stdin)) > 0) {
        size_t c = qlz_compress(in, out, n, &st);
        fwrite(out, 1, c, stdout);
    }
    return 0;
}
""")
    exe = d / "qlzc"
    subprocess.run(
        ["g++", "-O2", "-x", "c", str(drv), "-x", "c", _QLZ_SRC,
         "-I", os.path.dirname(_QLZ_SRC), "-o", str(exe)],
        check=True, capture_output=True)
    return str(exe)


def _compress_ref(exe, data: bytes, chunk: int) -> bytes:
    r = subprocess.run([exe, str(chunk)], input=data, capture_output=True,
                       check=True)
    return r.stdout


def _decompress_chunks(blob: bytes, total: int) -> bytes:
    out, off = [], 0
    while off < len(blob):
        csize = qlz.size_compressed(blob, off)
        out.append(qlz.decompress(blob, off))
        off += csize
    got = b"".join(out)
    assert len(got) == total
    return got


@pytest.mark.parametrize("kind", ["random", "runs", "text", "vocab"])
def test_qlz_matches_reference(qlz_tool, kind, tmp_path):
    rng = np.random.RandomState(hash(kind) % 2 ** 31)
    if kind == "random":              # incompressible -> stored chunks
        data = rng.bytes(25000)
    elif kind == "runs":              # RLE / overlapping-match paths
        parts = []
        for _ in range(300):
            parts.append(bytes([rng.randint(256)]) * rng.randint(1, 120))
            parts.append(rng.bytes(rng.randint(1, 10)))
        data = b"".join(parts)
    elif kind == "text":              # repetitive structured data
        data = (b"frame=%06d pose=[0.1 0.2 0.3] energy=8.25 ok\n" * 700)
    else:                             # an actual vocabulary payload
        v, _ = _train_vocab(seed=3)
        p = str(tmp_path / "v.dbow3")
        v.save_binary(p)
        data = open(p, "rb").read()[13:]
    for chunk in (10000, 216, 50):    # 216 = 1-byte/4-byte header boundary
        blob = _compress_ref(qlz_tool, data, chunk)
        assert _decompress_chunks(blob, len(data)) == data


def test_compressed_vocab_loads(qlz_tool, tmp_path):
    """Full .dbow3 with a QuickLZ-compressed payload (the distributed
    orbvoc.dbow3 layout) loads identically to the uncompressed one."""
    v, desc = _train_vocab(seed=7)
    plain = str(tmp_path / "plain.dbow3")
    v.save_binary(plain)
    raw = open(plain, "rb").read()
    payload = raw[13:]
    nnodes = struct.unpack_from("<I", raw, 9)[0]
    blob = _compress_ref(qlz_tool, payload, 10000)
    nchunks = (len(payload) + 9999) // 10000
    comp = str(tmp_path / "comp.dbow3")
    with open(comp, "wb") as f:
        f.write(struct.pack("<QBII", Vocabulary.MAGIC, 1, nnodes, nchunks))
        f.write(blob)
    w = Vocabulary.load(comp)
    np.testing.assert_array_equal(w.node_desc, v.node_desc)
    np.testing.assert_array_equal(w.word_id, v.word_id)
    np.testing.assert_allclose(w.word_weight, v.word_weight, rtol=1e-6)
