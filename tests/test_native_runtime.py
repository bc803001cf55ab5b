"""C++ host runtime (grid subsampling + kNN) vs numpy oracles.

The native lib builds on first use (g++ available in the image); the
tests also pin the numpy fallbacks to the same semantics.
"""

import numpy as np
import pytest

from metatransformer_tpu.runtime import native


def test_native_library_builds():
    assert native.native_available(), "g++ build of libmtx_native.so failed"


def test_grid_subsample_merges_voxels():
    pts = np.array(
        [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [0.9, 0.9, 0.9]], np.float32
    )
    feats = np.array([[1.0], [3.0], [10.0]], np.float32)
    out_p, out_f = native.grid_subsample(pts, feats, dl=0.1)
    assert out_p.shape == (2, 3)
    np.testing.assert_allclose(out_p[0], [0.015, 0.015, 0.015], atol=1e-6)
    np.testing.assert_allclose(out_f[:, 0], [2.0, 10.0], atol=1e-6)


def test_grid_subsample_native_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    native_p, _ = native.grid_subsample(pts, None, dl=0.25)
    # force the numpy fallback
    lib, native._lib = native._lib, None
    tried, native._tried = native._tried, True
    try:
        np_p, _ = native.grid_subsample(pts, None, dl=0.25)
    finally:
        native._lib, native._tried = lib, tried
    assert native_p.shape == np_p.shape
    # same voxel-average set regardless of ordering
    a = sorted(tuple(r) for r in np.round(native_p, 4))
    b = sorted(tuple(r) for r in np.round(np_p, 4))
    assert a == b


@pytest.mark.parametrize("n", [100, 2000])
def test_knn_matches_bruteforce(n):
    rng = np.random.default_rng(1)
    support = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    queries = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    k = 8
    idx, d2 = native.knn_search(support, queries, k)
    # brute-force oracle
    full = (
        np.sum(queries**2, 1)[:, None]
        + np.sum(support**2, 1)[None]
        - 2 * queries @ support.T
    )
    want_d = np.sort(full, axis=1)[:, :k]
    np.testing.assert_allclose(np.sort(d2, axis=1), want_d, rtol=1e-3, atol=1e-4)
    # indices actually point at those distances
    picked = np.take_along_axis(full, idx, 1)
    np.testing.assert_allclose(np.sort(picked, 1), want_d, rtol=1e-3, atol=1e-4)
