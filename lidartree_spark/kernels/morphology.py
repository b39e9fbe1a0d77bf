"""Grey-scale morphology + smoothing primitives (pure numpy).

Semantics re-derived from lidaRtRee's use of the imager package:
- disk structuring element: /root/reference/R/tree_detection.R:219-232
- closing / median / Gaussian in dem_filtering: tree_detection.R:294-389
- erode/dilate for edge detection: /root/reference/R/gap_detection.R:274-291

Boundary convention: clipped window (equivalent to edge-replication for
rank filters), matching the reference's explicit edge padding
(tree_detection.R:315-333).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view


def create_disk(width: int = 5) -> np.ndarray:
    """Boolean disk mask; width must be odd (tree_detection.R:219-232)."""
    if width % 2 != 1:
        raise ValueError("Mask width should be uneven")
    r = width // 2
    ii, jj = np.mgrid[-r:r + 1, -r:r + 1]
    return (ii * ii + jj * jj) <= r * r


def pad_edge(a: np.ndarray, n: int) -> np.ndarray:
    """Edge-replication padding (tree_detection.R:315-333)."""
    return np.pad(a, n, mode="edge")


def unpad(a: np.ndarray, n: int) -> np.ndarray:
    return a[n:-n, n:-n] if n > 0 else a


def _rank_filter(a: np.ndarray, se: np.ndarray, op) -> np.ndarray:
    """Apply max/min over the structuring element neighborhood of each pixel.

    Pads with +/-inf so border windows are effectively clipped.
    """
    k = se.shape[0]
    r = k // 2
    fill = -np.inf if op is np.max else np.inf
    ap = np.pad(a.astype(np.float64), r, mode="constant", constant_values=fill)
    win = sliding_window_view(ap, (k, k))  # (h, w, k, k)
    vals = win[:, :, se]  # (h, w, nnz)
    return op(vals, axis=-1)


def grey_dilate(a: np.ndarray, se: np.ndarray) -> np.ndarray:
    return _rank_filter(a, np.asarray(se, bool), np.max)


def grey_erode(a: np.ndarray, se: np.ndarray) -> np.ndarray:
    return _rank_filter(a, np.asarray(se, bool), np.min)


def grey_closing(a: np.ndarray, se: np.ndarray) -> np.ndarray:
    """Morphological closing = dilation then erosion (tree_detection.R:337-341)."""
    return grey_erode(grey_dilate(a, se), se)


def _disk_chords(width: int):
    """Half-lengths rx(dy) of the disk's horizontal chords — the exact
    row-decomposition of create_disk(width)."""
    r = width // 2
    dys = np.arange(-r, r + 1)
    rx = np.floor(np.sqrt(r * r - dys * dys + 1e-9)).astype(int)
    return dys, rx


def binary_dilate_disk(a: np.ndarray, width: int) -> np.ndarray:
    """Exact binary dilation by create_disk(width) via chord decomposition:
    one horizontal running-max per DISTINCT chord half-length (uint8 views,
    no float gather), OR of vertical shifts. Identical to
    grey_dilate(a, create_disk(width)) > 0 for 0/1 inputs (parity-tested)
    at a fraction of the time/memory — the gap-detection height ladder runs
    ~20 of these per tile (gap_detection.R:166-178)."""
    m = (np.asarray(a) != 0).astype(np.uint8)
    h, w = m.shape
    dys, rx = _disk_chords(width)
    if width // 2 == 0:
        return m.astype(np.float64)
    # horizontal chord max via prefix sums: any-1-in-window == positive
    # window sum — O(n) per distinct half-length, no window materialization
    S = np.zeros((h, w + 1), dtype=np.int32)
    np.cumsum(m, axis=1, out=S[:, 1:])
    hdil = {}
    for k in sorted(set(rx.tolist())):
        if k == 0:
            hdil[0] = m
        else:
            lo = np.clip(np.arange(w) - k, 0, w)
            hi = np.clip(np.arange(w) + k + 1, 0, w)
            hdil[k] = (S[:, hi] - S[:, lo] > 0).astype(np.uint8)
    out = np.zeros((h, w), np.uint8)
    for dy, k in zip(dys.tolist(), rx.tolist()):
        src = hdil[k]
        if dy == 0:
            np.maximum(out, src, out=out)
        elif dy > 0:  # out(y) |= src(y + dy)
            np.maximum(out[:h - dy], src[dy:], out=out[:h - dy])
        else:
            np.maximum(out[-dy:], src[:h + dy], out=out[-dy:])
    return out.astype(np.float64)


def binary_erode_disk(a: np.ndarray, width: int) -> np.ndarray:
    """Binary erosion by duality: erode(A) = NOT dilate(NOT A) for the
    symmetric disk; out-of-bounds counts as background, matching
    _rank_filter's +inf-pad clipped-window convention."""
    m = (np.asarray(a) != 0)
    return 1.0 - binary_dilate_disk(~m, width)


def binary_closing_disk(a: np.ndarray, width: int) -> np.ndarray:
    """Binary closing = dilate then erode (tree_detection.R:337-341),
    chord-decomposed."""
    return binary_erode_disk(binary_dilate_disk(a, width), width)


def dilate_square3(a: np.ndarray) -> np.ndarray:
    """3x3 square max filter, separable — the incremental-dilation building
    block of maxima_detection METHOD 3 (tree_detection.R:475-490)."""
    # vertical pass
    v = a.copy()
    v[:-1] = np.maximum(v[:-1], a[1:])
    v[1:] = np.maximum(v[1:], a[:-1])
    # horizontal pass
    h = v.copy()
    h[:, :-1] = np.maximum(h[:, :-1], v[:, 1:])
    h[:, 1:] = np.maximum(h[:, 1:], v[:, :-1])
    return h


def median_filter(a: np.ndarray, size: int) -> np.ndarray:
    """Square-window median (imager::medianblur, tree_detection.R:342-346).

    Border windows use edge replication (consistent with the reference's own
    padding, which makes interior results pad-independent).
    """
    if size % 2 == 0:
        size += 1
    r = size // 2
    ap = np.pad(a.astype(np.float64), r, mode="edge")
    win = sliding_window_view(ap, (size, size))
    return np.median(win.reshape(win.shape[0], win.shape[1], -1), axis=-1)


def gaussian_kernel(sigma: float) -> np.ndarray:
    """Normalized 1D Gaussian truncated at ceil(3*sigma)."""
    r = max(1, int(np.ceil(3.0 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_smooth(a: np.ndarray, sigma: float) -> np.ndarray:
    """Separable FIR Gaussian blur with edge-replicated boundary.

    The reference uses imager's recursive Deriche filter per axis
    (tree_detection.R:357-366); engine and oracle share this FIR
    approximation (documented deviation, see SURVEY.md §7 hard parts).
    """
    if sigma <= 0:
        return a.astype(np.float64).copy()
    k = gaussian_kernel(sigma)
    r = len(k) // 2
    ap = np.pad(a.astype(np.float64), ((0, 0), (r, r)), mode="edge")
    out = np.empty_like(a, dtype=np.float64)
    # horizontal then vertical 1D convolutions (vectorized via correlate trick)
    win = sliding_window_view(ap, len(k), axis=1)
    out = win @ k
    ap = np.pad(out, ((r, r), (0, 0)), mode="edge")
    win = sliding_window_view(ap, len(k), axis=0)
    out = np.moveaxis(win, -1, 0)
    out = np.tensordot(k, out, axes=(0, 0))
    return out
