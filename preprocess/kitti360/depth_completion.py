"""IP-Basic morphological depth completion.

Parity: ``utils/depth_map_utils.py:66-286`` — invert depth, depth-binned
multi-scale dilation (near/med/far kernels), hole closure, median + bilateral
blur, column-wise top extrapolation, 6x dilation hole-fill, re-invert. The
reference's per-column Python loops are vectorized here (identical results:
the loops only build top-row masks, which are pure cummax operations).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is in the base image
    cv2 = None

FULL_KERNEL_5 = np.ones((5, 5), np.uint8)
FULL_KERNEL_7 = np.ones((7, 7), np.uint8)
FULL_KERNEL_9 = np.ones((9, 9), np.uint8)
FULL_KERNEL_31 = np.ones((31, 31), np.uint8)


def _cross(n: int) -> np.ndarray:
    k = np.zeros((n, n), np.uint8)
    k[n // 2, :] = 1
    k[:, n // 2] = 1
    return k


def _diamond(n: int) -> np.ndarray:
    r = n // 2
    y, x = np.mgrid[-r:r + 1, -r:r + 1]
    return (np.abs(x) + np.abs(y) <= r).astype(np.uint8)


CROSS_KERNEL_3 = _cross(3)
CROSS_KERNEL_5 = _cross(5)
CROSS_KERNEL_7 = _cross(7)
DIAMOND_KERNEL_5 = _diamond(5)


def _top_row_mask(depth: np.ndarray) -> np.ndarray:
    """True at and below each column's first valid (>0.1) pixel — the
    vectorized form of the reference's per-column argmax loops
    (depth_map_utils.py:206-235). Reference quirk preserved: for a column
    with NO valid pixel, ``argmax(col > 0.1)`` is 0 there, so the column
    stays ALL-True and remains eligible for the dilation hole-fills (a
    plain cummax would leave it all-False and never fill it)."""
    valid = depth > 0.1
    mask = np.cumsum(valid, axis=0) > 0
    mask[:, ~valid.any(axis=0)] = True
    return mask


def _extend_to_top(depth: np.ndarray) -> np.ndarray:
    """Copy each column's first valid value to every row above it."""
    valid = depth > 0.1
    top_rows = np.argmax(valid, axis=0)
    top_vals = depth[top_rows, np.arange(depth.shape[1])]
    rows = np.arange(depth.shape[0])[:, None]
    out = depth.copy()
    above = rows < top_rows[None, :]
    out = np.where(above, top_vals[None, :], out)
    return out


def fill_in_fast(depth_map: np.ndarray, max_depth: float = 100.0,
                 custom_kernel: np.ndarray = DIAMOND_KERNEL_5,
                 extrapolate: bool = False,
                 blur_type: str = "bilateral") -> np.ndarray:
    """Single-scale IP-Basic fill (depth_map_utils.py:66-130)."""
    d = depth_map.astype(np.float32).copy()
    valid = d > 0.1
    d[valid] = max_depth - d[valid]

    d = cv2.dilate(d, custom_kernel)
    d = cv2.morphologyEx(d, cv2.MORPH_CLOSE, FULL_KERNEL_5)

    empty = d < 0.1
    dilated = cv2.dilate(d, FULL_KERNEL_7)
    d[empty] = dilated[empty]

    if extrapolate:
        d = _extend_to_top(d)
        empty = d < 0.1
        dilated = cv2.dilate(d, FULL_KERNEL_31)
        d[empty] = dilated[empty]

    d = cv2.medianBlur(d, 5)
    if blur_type == "bilateral":
        d = cv2.bilateralFilter(d, 5, 1.5, 2.0)
    else:
        valid = d > 0.1
        blurred = cv2.GaussianBlur(d, (5, 5), 0)
        d[valid] = blurred[valid]

    valid = d > 0.1
    d[valid] = max_depth - d[valid]
    return d


def fill_in_multiscale(depth_map: np.ndarray, max_depth: float = 100.0,
                       dilation_kernel_far: np.ndarray = CROSS_KERNEL_3,
                       dilation_kernel_med: np.ndarray = CROSS_KERNEL_5,
                       dilation_kernel_near: np.ndarray = CROSS_KERNEL_7,
                       extrapolate: bool = False,
                       blur_type: str = "bilateral") -> np.ndarray:
    """Multi-scale IP-Basic fill (depth_map_utils.py:133-286)."""
    d_in = depth_map.astype(np.float32)

    near_m = (d_in > 0.1) & (d_in <= 15.0)
    med_m = (d_in > 15.0) & (d_in <= 30.0)
    far_m = d_in > 30.0

    inv = d_in.copy()
    valid = inv > 0.1
    inv[valid] = max_depth - inv[valid]

    dil_far = cv2.dilate(inv * far_m, dilation_kernel_far)
    dil_med = cv2.dilate(inv * med_m, dilation_kernel_med)
    dil_near = cv2.dilate(inv * near_m, dilation_kernel_near)

    d = inv.copy()
    d[dil_far > 0.1] = dil_far[dil_far > 0.1]
    d[dil_med > 0.1] = dil_med[dil_med > 0.1]
    d[dil_near > 0.1] = dil_near[dil_near > 0.1]

    d = cv2.morphologyEx(d, cv2.MORPH_CLOSE, FULL_KERNEL_5)

    blurred = cv2.medianBlur(d, 5)
    valid = d > 0.1
    d[valid] = blurred[valid]

    # Fill small holes below the skyline with a 9x9 dilation.
    top_mask = _top_row_mask(d)
    empty = (~(d > 0.1)) & top_mask
    dilated = cv2.dilate(d, FULL_KERNEL_9)
    d[empty] = dilated[empty]

    if extrapolate:
        d = _extend_to_top(d)
        top_mask = np.ones_like(d, bool)
    else:
        top_mask = _top_row_mask(d)

    for _ in range(6):
        empty = (d < 0.1) & top_mask
        dilated = cv2.dilate(d, FULL_KERNEL_5)
        d[empty] = dilated[empty]

    blurred = cv2.medianBlur(d, 5)
    valid = (d > 0.1) & top_mask
    d[valid] = blurred[valid]

    if blur_type == "gaussian":
        blurred = cv2.GaussianBlur(d, (5, 5), 0)
        valid = (d > 0.1) & top_mask
        d[valid] = blurred[valid]
    else:
        blurred = cv2.bilateralFilter(d, 5, 0.5, 2.0)
        d[valid] = blurred[valid]

    valid = d > 0.1
    d[valid] = max_depth - d[valid]
    return d
