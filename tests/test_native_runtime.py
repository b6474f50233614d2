"""Native C++ runtime kernels vs their numpy fallbacks."""

import numpy as np
import pytest

native = pytest.importorskip("cfd_with_cuda_tpu.runtime.native")


def test_coalesce_pattern_matches_numpy(rng):
    rows = rng.integers(0, 500, 60000)
    cols = rng.integers(0, 400, 60000)
    indptr, indices, inverse = native.coalesce_pattern(rows, cols, 500, 400)
    keys = rows * 400 + cols
    ukeys, inv2 = np.unique(keys, return_inverse=True)
    np.testing.assert_array_equal(indices, ukeys % 400)
    np.testing.assert_array_equal(inverse, inv2)
    np.testing.assert_array_equal(
        np.diff(indptr), np.bincount(ukeys // 400, minlength=500)
    )


def test_first_seen_ids_matches_numpy(rng):
    k = rng.integers(0, 300, 50000)
    ids, nu = native.first_seen_ids(k)
    _, fi, inv = np.unique(k, return_index=True, return_inverse=True)
    order = np.argsort(fi, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    np.testing.assert_array_equal(ids, rank[inv])
    assert nu == order.size


def test_first_seen_order_semantics():
    """First-seen numbering: first distinct key -> 0, next new key -> 1..."""
    ids, nu = native.first_seen_ids(np.array([7, 7, 3, 7, 9, 3]))
    np.testing.assert_array_equal(ids, [0, 0, 1, 0, 2, 1])
    assert nu == 3


def test_pattern_path_used_by_library():
    """build_csr_pattern (which routes through the native kernel when
    available) still matches the dense oracle."""
    from cfd_with_cuda_tpu.fem.sparse import build_csr_pattern

    rng = np.random.default_rng(5)
    conn = rng.integers(0, 30, (10, 8))
    pat = build_csr_pattern(conn, conn, 30, 30)
    dense = np.zeros((30, 30))
    ones = np.ones((10, 8, 8))
    got = pat.to_scipy(pat.assemble(ones)).toarray()
    for e in range(10):
        for i in range(8):
            for j in range(8):
                dense[conn[e, i], conn[e, j]] += 1
    np.testing.assert_allclose(got, dense)
