"""Tree extraction: segment stats + apex rows + crown WKT polygons.

Re-derivation of /root/reference/R/tree_detection.R:1000-1086.
"""

from __future__ import annotations

import numpy as np


def tree_extraction(
    dem_nl: np.ndarray,
    maxi: np.ndarray,
    dem_w: np.ndarray,
    x0: float = 0.0,
    y1: float | None = None,
    res: float = 1.0,
    mask: np.ndarray | None = None,
    crown: bool = False,
) -> list[dict]:
    """Emit one row per apex (local maximum) with zonal segment stats.

    - surface  s = n_pixels * res^2                (tree_detection.R:1018-1020)
    - volume   v = sum(dem_nl over segment) * res^2 (:1022-1024)
    - mask variant sp (in-mask pixel count * res^2) and vp (NaN when the
      segment is only partially inside the mask — faithful to R's
      sum-with-NA semantics, :1027-1040)
    - apex rows at maxi>0 cells: x, y cell centers, h from dem_nl,
      dom_radius from maxi (:1043-1052)
    - crown WKT with quantized digits (:1067-1084)

    Georef: `x0` = left edge, `y1` = TOP edge (row 0 is the top of the tile);
    defaults to y1 = h*res so y decreases with row index, like terra.
    """
    nl = np.asarray(dem_nl, dtype=np.float64)
    mx = np.asarray(maxi, dtype=np.float64)
    w_ = np.asarray(dem_w, dtype=np.int64)
    h_px, w_px = nl.shape
    if y1 is None:
        y1 = h_px * res

    ids = np.unique(w_)
    remap = np.searchsorted(ids, w_)
    counts = np.bincount(remap.ravel(), minlength=len(ids))
    sums = np.bincount(remap.ravel(), weights=nl.ravel(), minlength=len(ids))
    s_by = dict(zip(ids.tolist(), (counts * res * res).tolist()))
    v_by = dict(zip(ids.tolist(), (sums * res * res).tolist()))

    sp_by = vp_by = None
    if mask is not None:
        mk = np.asarray(mask, dtype=np.float64)  # 1 inside, NaN outside
        mx = mx * np.nan_to_num(mk, nan=0.0)
        in_mask = ~np.isnan(mk)
        sp_counts = np.bincount(remap[in_mask].ravel(), minlength=len(ids))
        sp_by = dict(zip(ids.tolist(), (sp_counts * res * res).tolist()))
        vmask = nl * mk  # NaN outside mask
        vp_sums = np.full(len(ids), 0.0)
        has_nan = np.zeros(len(ids), dtype=bool)
        np.add.at(vp_sums, remap.ravel(), np.nan_to_num(vmask, nan=0.0).ravel())
        np.logical_or.at(has_nan, remap.ravel(), np.isnan(vmask).ravel())
        vp_sums[has_nan] = np.nan
        vp_by = dict(zip(ids.tolist(), (vp_sums * res * res).tolist()))

    crowns = crown_wkt(w_, x0=x0, y1=y1, res=res) if crown else {}

    ys, xs = np.nonzero(mx > 0)
    rows = []
    for y, x in zip(ys.tolist(), xs.tolist()):
        seg = int(w_[y, x])
        row = {
            "id": seg,
            "x": x0 + (x + 0.5) * res,
            "y": y1 - (y + 0.5) * res,
            "h": float(nl[y, x]),
            "dom_radius": float(mx[y, x]),
            "s": s_by.get(seg),
            "v": v_by.get(seg),
        }
        if sp_by is not None:
            row["sp"] = sp_by.get(seg)
            row["vp"] = vp_by.get(seg)
        if crown:
            row["crown"] = crowns.get(seg)
        rows.append(row)
    return rows


def _trace_boundary(cells: set[tuple[int, int]]) -> list[tuple[int, int]]:
    """Trace the outer boundary of a 4-connected pixel region as a closed
    sequence of lattice corner points (x, y in pixel-corner coordinates,
    y increasing downward). Standard grid edge-walk; holes are omitted
    (documented deviation from terra::as.polygons for ring-shaped crowns)."""
    # collect boundary edges as directed segments keeping region on the left;
    # a corner may have two outgoing edges (diagonally-touching cells), so
    # keep a multimap and resolve by preferring the sharpest left turn.
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(a, b):
        edges.setdefault(a, []).append(b)

    for (y, x) in cells:
        if (y - 1, x) not in cells:  # top edge, left->right
            add((x, y), (x + 1, y))
        if (y + 1, x) not in cells:  # bottom edge, right->left
            add((x + 1, y + 1), (x, y + 1))
        if (y, x - 1) not in cells:  # left edge, bottom->top
            add((x, y + 1), (x, y))
        if (y, x + 1) not in cells:  # right edge, top->bottom
            add((x + 1, y), (x + 1, y + 1))
    if not edges:
        return []
    start = min(edges)  # deterministic start corner (topmost-left on outer ring)
    ring = [start]
    prev = None
    cur = start
    while True:
        cands = edges[cur]
        if len(cands) == 1 or prev is None:
            nxt = cands[0]
        else:
            # prefer the left turn relative to the incoming direction
            dx, dy = cur[0] - prev[0], cur[1] - prev[1]
            left = (cur[0] + dy, cur[1] - dx)
            nxt = left if left in cands else cands[0]
        cands.remove(nxt)
        if not cands:
            del edges[cur]
        prev, cur = cur, nxt
        ring.append(cur)
        if cur == start:
            break
    return ring


def crown_wkt(
    dem_w: np.ndarray,
    x0: float = 0.0,
    y1: float | None = None,
    res: float = 1.0,
) -> dict[int, str]:
    """Per-segment 2D crown polygons as WKT, digits quantized per the
    reference rule (tree_detection.R:1073-1078): total significant digits =
    ceil(log10(max |bbox|)) + digits right of the decimal point of res/10.

    Note: tracing keeps only the outer ring of the largest connected part of
    each segment (crowns are near-convex blobs in practice)."""
    w_ = np.asarray(dem_w, dtype=np.int64)
    h_px = w_.shape[0]
    if y1 is None:
        y1 = h_px * res
    # digits rule
    xmax = abs(x0) + w_.shape[1] * res
    ymax = abs(y1) + h_px * res
    n1 = int(np.ceil(np.log10(max(xmax, ymax, 1.0000001))))
    n2 = int(abs(min(np.floor(np.log10(res / 10.0)), 0)))
    dec = max(n2 - 0, 0)  # decimals right of the point

    out = {}
    for seg in np.unique(w_):
        if seg == 0:
            continue
        ys, xs = np.nonzero(w_ == seg)
        cells = set(zip(ys.tolist(), xs.tolist()))
        ring = _trace_boundary(cells)
        if not ring:
            continue
        pts = []
        for cx, cy in ring:
            gx = x0 + cx * res
            gy = y1 - cy * res
            pts.append(f"{round(gx, dec):.{dec}f} {round(gy, dec):.{dec}f}"
                       if dec > 0 else f"{int(round(gx))} {int(round(gy))}")
        out[int(seg)] = "POLYGON ((" + ", ".join(pts) + "))"
    return out
