"""Coregistration kernels: raster correlation, moving correlation surface,
local-max statistics. Re-derivation of /root/reference/R/coregistration.R.
"""

from __future__ import annotations

import numpy as np

from lidartree_spark.kernels.detection import maxima_detection, maxima_selection
from lidartree_spark.kernels.stats import quantile_type7


def rasters2cor(big: np.ndarray, small: np.ndarray) -> float:
    """Pearson-style correlation of two equal-shape arrays where `small` is
    already centered/standardized (coregistration.R:78-109, small.SC=TRUE
    path): mean(big_centered * small) / sd(big)."""
    b = np.asarray(big, dtype=np.float64)
    s = np.asarray(small, dtype=np.float64)
    m = ~(np.isnan(b) | np.isnan(s))
    if m.sum() < 2:
        return float("nan")
    bb = b[m] - b[m].mean()
    sd_b = b[m].std(ddof=1)
    if sd_b == 0:
        return float("nan")
    return float(np.mean(bb * s[m]) / sd_b)


def rasters_moving_cor(
    big: np.ndarray,
    small: np.ndarray,
    mask: np.ndarray | None = None,
    buffer: float = 19.0,
    step: float = 0.5,
    res: float = 0.5,
) -> list[dict]:
    """Correlation for every (dx, dy) translation within a disk buffer
    (coregistration.R:162-220). Translations are in MAP units and must be
    multiples of `res` to stay cell-aligned (the reference shifts raster
    extents; with step = res/k the overlap grid realigns — we restrict to
    cell-aligned shifts, step rounded to a multiple of res, which matches the
    reference's default step=0.5 on 0.5 m rasters).

    `small` is centered/standardized over its finite cells once (:173-174).
    Returns rows (xoffset, yoffset, correlation).
    """
    b = np.asarray(big, dtype=np.float64)
    s = np.asarray(small, dtype=np.float64).copy()
    if mask is not None:
        s = s * np.asarray(mask, dtype=np.float64)
    fin = ~np.isnan(s)
    s = s - np.nanmean(s)
    sd = np.nanstd(s, ddof=1)
    if sd > 0:
        s = s / sd
    h, w = s.shape
    out = []
    buff2 = buffer * buffer
    n_steps = int(round(buffer / step))
    px_per_step = step / res
    for ix in range(-n_steps, n_steps + 1):
        xoff = ix * step
        for iy in range(-n_steps, n_steps + 1):
            yoff = iy * step
            if xoff * xoff + yoff * yoff > buff2:
                continue
            dx = int(round(ix * px_per_step))
            dy = int(round(iy * px_per_step))
            # shift small by (dx, -dy) in pixel space (y axis points up in map
            # space, rows grow downward); compute correlation on the overlap
            # of `big` (same grid) with the shifted `small`.
            x0s, x1s = max(0, -dx), min(w, w - dx)
            y0s, y1s = max(0, dy), min(h, h + dy)
            if x1s <= x0s or y1s <= y0s:
                continue
            sub_s = s[y0s:y1s, x0s:x1s]
            sub_m = (np.asarray(mask, dtype=np.float64)[y0s:y1s, x0s:x1s]
                     if mask is not None else None)
            x0b, y0b = x0s + dx, y0s - dy
            sub_b = b[y0b:y0b + sub_s.shape[0], x0b:x0b + sub_s.shape[1]]
            if sub_m is not None:
                sub_b = sub_b * sub_m
            out.append({"xoffset": xoff, "yoffset": yoff,
                        "correlation": rasters2cor(sub_b, sub_s)})
    return out


def raster_local_max(
    rows: list[dict],
    step: float,
    dm: float = 2.0,
    med1: float = 1.0,
    med2: float = 2.0,
    quanta: float = 0.75,
    quantb: float = 0.5,
) -> dict | None:
    """Top-2 local maxima of the correlation surface with min-distance dm,
    plus ratios to local medians and global quantiles
    (coregistration.R:275-331). `rows` = output of rasters_moving_cor.
    """
    if not rows:
        return None
    xs = sorted({r["xoffset"] for r in rows})
    ys = sorted({r["yoffset"] for r in rows})
    xi = {v: i for i, v in enumerate(xs)}
    yi = {v: i for i, v in enumerate(ys)}
    grid = np.full((len(ys), len(xs)), np.nan)
    for r in rows:
        # row 0 = largest y (map convention: y decreases with row index)
        grid[len(ys) - 1 - yi[r["yoffset"]], xi[r["xoffset"]]] = r["correlation"]
    work = np.where(np.isnan(grid), -np.inf, grid)
    maxi = maxima_detection(work, res=step, jitter=False)
    maxi = maxima_selection(maxi, np.ones_like(work), hmin=0.0, dmin=dm, dprop=0.0)
    cand = np.where(maxi > 0, grid, np.nan)
    if np.all(np.isnan(cand)):
        return None
    flat = np.nan_to_num(cand, nan=-np.inf)
    i1 = np.unravel_index(np.argmax(flat), flat.shape)
    max1 = float(grid[i1])
    x1, y1 = xs[i1[1]], ys[len(ys) - 1 - i1[0]]
    flat2 = flat.copy()
    flat2[i1] = -np.inf
    i2 = np.unravel_index(np.argmax(flat2), flat2.shape)
    max2 = float(grid[i2]) if np.isfinite(flat2[i2]) else float("nan")
    x2, y2 = xs[i2[1]], ys[len(ys) - 1 - i2[0]]
    # medians in square neighborhoods around the max (:304-316)
    def medloc(rad):
        vals = [r["correlation"] for r in rows
                if abs(r["xoffset"] - x1) <= rad + step / 2
                and abs(r["yoffset"] - y1) <= rad + step / 2
                and not np.isnan(r["correlation"])]
        return float(np.median(vals)) if vals else float("nan")
    all_vals = np.array([r["correlation"] for r in rows
                         if not np.isnan(r["correlation"])])
    qa = float(quantile_type7(all_vals, quanta))
    qb = float(quantile_type7(all_vals, quantb))
    return {
        "max1": max1, "dx1": float(x1), "dy1": float(y1),
        "dx2": float(x2), "dy2": float(y2),
        "ratiomax1max2": max1 / max2 if max2 else float("nan"),
        "rmedloc1": max1 / medloc(med1), "rmedloc2": max1 / medloc(med2),
        "rquanta": max1 / qa if qa else float("nan"),
        "rquantb": max1 / qb if qb else float("nan"),
    }
