"""Gap detection + edge detection kernels.

Re-derivation of /root/reference/R/gap_detection.R:142-291.
"""

from __future__ import annotations

import numpy as np

from lidartree_spark.kernels.detection import dem_filtering
from lidartree_spark.kernels.morphology import (
    binary_closing_disk,
    binary_dilate_disk,
    binary_erode_disk,
)
from lidartree_spark.kernels.segmentation import label_components


def gap_detection(
    chm: np.ndarray,
    res: float = 1.0,
    ratio: float | None = 2.0,
    gap_max_height: float = 1.0,
    min_gap_surface: float = 25.0,
    max_gap_surface: float = float("inf"),
    closing_height_bin: float = 1.0,
    nl_filter: str = "Median",
    nl_size: int = 3,
    gap_reconstruct: bool = False,
    max_height: float | None = None,
) -> dict:
    """Multi-threshold morphological gap detection (gap_detection.R:142-228).

    Returns dict of layers gap_id (0 = not a gap), gap_surface (NaN outside
    gaps), filled_chm. Per-height-bin closing disk width
    floor(i/ratio/res/2)*2+1 (:173-176); gaps = complement of the union of
    closed masks (:181-183); optional reconstruction into connected low
    pixels (:184-196); component labeling + surface filter (:199-224).
    """
    c = dem_filtering(chm, nl_filter=nl_filter, nl_size=nl_size, sigma=0.0,
                      res=res)["non_linear_image"]
    if ratio is None:
        non_gap = (c > gap_max_height).astype(np.float64)
    else:
        non_gap = np.zeros_like(c)
        # max_height pins the height-bin loop bound; pass a corpus-wide
        # constant when tiles are processed independently so per-tile results
        # are identical to a mosaic run (cross-tile merge relies on this)
        top_src = float(c.max()) if max_height is None else float(max_height)
        top = max(gap_max_height, min(top_src, 60.0))
        i = gap_max_height
        while i <= top + 1e-9:
            binary = (c > i).astype(np.float64)
            if not binary.any():
                # (c > i) is monotone decreasing in i: this bin and all
                # higher ones close all-zero binaries (exact no-ops), so a
                # ladder pinned to a corpus-wide max_height above the local
                # canopy max costs nothing extra
                break
            width = int(np.floor(i / ratio / res / 2.0)) * 2 + 1
            # binary chord-decomposed closing — exact parity with
            # grey_closing(binary, create_disk(width)) on 0/1 input at a
            # fraction of the cost (see morphology.binary_closing_disk)
            closed = binary_closing_disk(binary, width)
            non_gap = np.maximum(non_gap, closed)
            i += closing_height_bin
    gaps = np.abs(non_gap - 1.0)

    if gap_reconstruct:
        # extend non-closed gaps into connected low pixels (:184-196)
        candidates = c < gap_max_height
        labels = label_components(candidates)
        kept = np.setdiff1d(np.unique(labels * (gaps > 0)), [0])
        gaps = np.isin(labels, kept).astype(np.float64)

    labels = label_components(gaps > 0).astype(np.float64)
    counts = np.bincount(labels.astype(np.int64).ravel())
    surface = counts.astype(np.float64) * res * res
    gap_surface = np.full(labels.shape, np.nan)
    pos = labels > 0
    gap_surface[pos] = surface[labels[pos].astype(np.int64)]
    # surface filter (:222-224)
    bad = pos & ((gap_surface < min_gap_surface) | (gap_surface > max_gap_surface))
    labels[bad] = 0
    gap_surface[bad] = np.nan
    labels[labels == 0] = 0
    return {"gap_id": labels, "gap_surface": gap_surface, "filled_chm": c}


def edge_detection(gaps: np.ndarray, inside: bool = True) -> np.ndarray:
    """Gap edges: erode (inside) or dilate (outside) by a 3px disk, then
    != with the input (gap_detection.R:274-291)."""
    g = (np.nan_to_num(np.asarray(gaps, dtype=np.float64), nan=0.0)
         != 0).astype(np.float64)
    morpho = binary_erode_disk(g, 3) if inside else binary_dilate_disk(g, 3)
    return (morpho != g).astype(np.float64)
