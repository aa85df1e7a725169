"""Native C++ searchsorted vs the numpy oracle.

Mirrors the reference's parametrized sweep
(``torchsearchsorted/test/test_searchsorted.py:28-44``): batch/row-broadcast
combinations x sides, against per-row ``np.searchsorted``.
"""

import numpy as np
import pytest

from depth_lidar_nerf_tpu.ops.native_searchsorted import searchsorted_native


def _oracle(a, v, side):
    rows = max(a.shape[0], v.shape[0])
    out = np.empty((rows, v.shape[1]), np.int64)
    for r in range(rows):
        out[r] = np.searchsorted(a[min(r, a.shape[0] - 1)],
                                 v[min(r, v.shape[0] - 1)], side=side)
    return out


@pytest.mark.parametrize("Ba,Bv", [(1, 1), (7, 1), (1, 7), (7, 7), (100, 100)])
@pytest.mark.parametrize("A,V", [(1, 1), (33, 17), (300, 100)])
@pytest.mark.parametrize("side", ["left", "right"])
def test_searchsorted_native_matches_numpy(Ba, Bv, A, V, side, rng_np):
    for _ in range(5):
        a = np.sort(rng_np.standard_normal((Ba, A)).astype(np.float32), -1)
        v = rng_np.standard_normal((Bv, V)).astype(np.float32)
        # exact-hit coverage
        if A >= 3 and V >= 2:
            v[:, 0] = a[0, 2]
        got = searchsorted_native(a, v, side)
        np.testing.assert_array_equal(got, _oracle(a, v, side))


def test_searchsorted_native_f64(rng_np):
    a = np.sort(rng_np.standard_normal((5, 50)), -1)
    v = rng_np.standard_normal((5, 20))
    got = searchsorted_native(a, v, "right")
    np.testing.assert_array_equal(got, _oracle(a, v, "right"))


def test_searchsorted_native_validates():
    a = np.zeros((3, 4), np.float32)
    v = np.zeros((2, 4), np.float32)
    with pytest.raises(ValueError):
        searchsorted_native(a, v)
    with pytest.raises(ValueError):
        searchsorted_native(a[0], v)
    with pytest.raises(ValueError):
        searchsorted_native(a, a, side="middle")


def test_searchsorted_native_nan_total_order(rng_np):
    """numpy sorts NaN after every number; the native kernel must agree for
    NaN queries AND NaN entries in the sorted rows."""
    a = np.sort(rng_np.standard_normal((4, 16)).astype(np.float32), -1)
    v = np.array([[np.nan, 0.0, -10.0, np.nan]] * 4, np.float32)
    a_nan = a.copy()
    a_nan[:, -2:] = np.nan  # NaNs sort last, rows stay "sorted"
    for arr in (a, a_nan):
        for side in ("left", "right"):
            got = searchsorted_native(arr, v, side)
            np.testing.assert_array_equal(got, _oracle(arr, v, side))
