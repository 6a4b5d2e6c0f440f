"""Native C++ ingestion kernels vs numpy reference."""

import numpy as np
import pytest

from pytorch_nmf_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)

RNG = np.random.RandomState(0)


def test_coalesce_matches_numpy():
    nnz = 50_000
    flat = RNG.randint(0, 30_000, nnz).astype(np.int64)
    vals = RNG.rand(nnz).astype(np.float32)

    uf, uv = native.coalesce_flat(flat, vals)

    order = np.argsort(flat, kind="stable")
    f2, v2 = flat[order], vals[order]
    uniq, inv = np.unique(f2, return_inverse=True)
    summed = np.zeros(uniq.shape[0], np.float32)
    np.add.at(summed, inv, v2)

    assert np.array_equal(uf, uniq)
    assert np.abs(uv - summed).max() < 1e-3  # summation order differs


def test_coalesce_no_duplicates_identity():
    flat = np.arange(1000, dtype=np.int64)
    RNG.shuffle(flat)
    vals = RNG.rand(1000).astype(np.float32)
    uf, uv = native.coalesce_flat(flat, vals)
    order = np.argsort(flat)
    assert np.array_equal(uf, flat[order])
    assert np.array_equal(uv, vals[order])


def test_coalesce_empty():
    uf, uv = native.coalesce_flat(
        np.empty(0, np.int64), np.empty(0, np.float32)
    )
    assert uf.size == 0 and uv.size == 0


def test_extract_matches_numpy():
    dense = RNG.rand(513, 200).astype(np.float32)
    fl, vv = native.extract_nonzeros(dense, 0.9)
    idx = np.nonzero(dense > 0.9)
    assert np.array_equal(fl, np.ravel_multi_index(idx, dense.shape))
    assert np.array_equal(vv, dense[idx])


def test_extract_all_and_none():
    dense = np.ones((64, 64), np.float32)
    fl, vv = native.extract_nonzeros(dense, 0.5)
    assert fl.size == 64 * 64
    fl, vv = native.extract_nonzeros(dense, 2.0)
    assert fl.size == 0
