"""Tree-top detection kernels: filtering, variable-window maxima, selection.

Re-derivation of /root/reference/R/tree_detection.R:
- dem_filtering      :294-389
- maxima_detection   :425-499 (METHOD 3 incremental dilation)
- maxima_selection   :555-575
"""

from __future__ import annotations

import numpy as np

from lidartree_spark.kernels.morphology import (
    create_disk,
    dilate_square3,
    gaussian_smooth,
    grey_closing,
    median_filter,
    pad_edge,
    unpad,
)


def dem_filtering(
    dem: np.ndarray,
    nl_filter: str = "Closing",
    nl_size: int = 5,
    sigma=0.3,
    padding: bool = True,
    res: float = 1.0,
) -> dict:
    """Non-linear filter + Gaussian smoothing (tree_detection.R:294-389).

    `sigma` is either a scalar (meters) or a list of (sigma_m, threshold)
    pairs for value-dependent smoothing (:351-363). Sigma meters->pixels
    conversion uses `res` (:299-304). Returns dict with non_linear_image and
    smoothed_image (float64, same shape as input).
    """
    a = np.nan_to_num(np.asarray(dem, dtype=np.float64), nan=0.0)
    if np.isscalar(sigma):
        sig_px = float(sigma) / res
        sig_list = None
        max_sig = sig_px
    else:
        sig_list = [(float(s) / res, float(t)) for s, t in sigma]
        max_sig = max(s for s, _ in sig_list)

    border = 0
    if padding:
        # border = max(half nl window + 1, ceil(3 sigma)) (:315-333)
        border = int(max((nl_size - 1) // 2 + 1, int(np.ceil(max_sig * 3))))
        a = pad_edge(a, border)

    # non-linear filtering (:335-346)
    if nl_filter == "Closing":
        dem_nl = grey_closing(a, create_disk(nl_size))
    elif nl_filter == "Median":
        dem_nl = median_filter(a, nl_size)
    elif nl_filter == "None":
        dem_nl = a.copy()
    else:
        raise ValueError(f"unknown nl_filter {nl_filter!r}")

    # Gaussian smoothing, optionally value-dependent (:348-371)
    if sig_list is not None:
        dem_gs = dem_nl.copy()
        for s_px, thresh in sig_list:
            smoothed = gaussian_smooth(dem_nl, s_px)
            sel = dem_gs >= thresh  # thresholds applied to the running output
            dem_gs[sel] = smoothed[sel]
    else:
        dem_gs = gaussian_smooth(dem_nl, sig_px) if sig_px > 0 else dem_nl.copy()

    if padding:
        dem_nl = unpad(dem_nl, border)
        dem_gs = unpad(dem_gs, border)
    return {"non_linear_image": dem_nl, "smoothed_image": dem_gs}


def maxima_detection(
    dem: np.ndarray,
    res: float = 1.0,
    max_width: float = 11.0,
    jitter: bool = False,
    jitter_seed: int | None = None,
) -> np.ndarray:
    """Variable-window local maxima (tree_detection.R:425-499).

    Output value = dominance radius in METERS: (r + 1) * res where r is the
    largest tested radius (in pixels) at which the pixel equals the max of its
    (2r+1)^2 square window; 0 for non-maxima (:475-493). `max_width` is in
    meters (converted to pixels :430). Jitter (:437-441) is deterministic
    here: seeded from `jitter_seed` (e.g. hash of image_id) — disabled by
    default for reproducibility.
    """
    a = np.nan_to_num(np.asarray(dem, dtype=np.float64), nan=0.0)
    max_width_px = max_width / res
    if jitter:
        rng = np.random.default_rng(0 if jitter_seed is None else jitter_seed)
        sd = float(a.std(ddof=1)) / 100000.0
        if sd > 0:
            a = a + np.abs(rng.normal(0.0, sd, a.shape)) * (a != 0)
    max_radius = int(max_width_px // 2)
    dil = dilate_square3(a)
    maxi = (a == dil).astype(np.float64)  # radius-1 result (0/1)
    for i in range(2, max_radius + 1):
        dil = dilate_square3(dil)
        maxi = np.maximum(maxi, (a == dil).astype(np.float64) * i)
    return (maxi > 0) * (maxi + 1.0) * res


def maxima_selection(
    maxi: np.ndarray,
    dem_nl: np.ndarray,
    hmin: float = 5.0,
    dmin: float = 0.0,
    dprop: float = 0.05,
) -> np.ndarray:
    """Zero maxima below height/dominance thresholds (tree_detection.R:555-575)."""
    out = np.asarray(maxi, dtype=np.float64).copy()
    d = np.asarray(dem_nl, dtype=np.float64)
    out[d < hmin] = 0.0
    out[out < (dmin + d * dprop)] = 0.0
    return out
