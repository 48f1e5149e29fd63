"""Native hostops bindings: bit-exact parity with the Python fallbacks."""

import numpy as np
import pytest

from legalrag_tpu import native
from legalrag_tpu.tokenize import fnv1a, tokenize_en
from legalrag_tpu.tokenize.tokenizers import fnv1a_batch


def test_hash_parity_regardless_of_backend():
    feats = ["", "a", "hello world", "世界和平", "seller's", "x" * 100]
    got = native.fnv1a64_batch(feats, seed=3)
    for f, h in zip(feats, got):
        assert int(h) == fnv1a(f, seed=3)


def test_sketch_accumulate_matches_numpy():
    rng = np.random.default_rng(0)
    hashes = rng.integers(0, 2**63, 500, dtype=np.uint64)
    rows = rng.integers(0, 4, 500, dtype=np.int32)
    got = native.sketch_accumulate(hashes, rows, 4, 128)
    want = np.zeros((4, 128), np.float32)
    buckets = (hashes % np.uint64(128)).astype(np.int64)
    signs = np.where((hashes >> np.uint64(62)) & np.uint64(1), 1.0, -1.0)
    np.add.at(want.ravel(), rows.astype(np.int64) * 128 + buckets,
              signs.astype(np.float32))
    np.testing.assert_array_equal(got, want)


def test_tokenize_parity():
    texts = [
        "The Seller's goods, § 2-201; don't STOP now",
        "a1 b2 C3 ... under UCC Article 9!",
        "",
        "no-punct plain words here",
    ]
    for t in texts:
        assert native.tokenize_ascii(t) == tokenize_en(t), t


@pytest.mark.skipif(not native.available(), reason="libhostops not built")
def test_native_lib_is_active():
    # CI guard: when the lib exists it must actually load
    assert native.available()
