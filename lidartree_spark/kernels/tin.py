"""TIN (triangulated irregular network) kernels: pure-numpy Delaunay
triangulation + linear barycentric interpolation onto a raster grid.

Re-derivation of points2DTM semantics (/root/reference/R/common.R:105-123):
the reference rasterizes ground points to a DTM with
`lidR::rasterize_terrain(..., algorithm = tin())` — Delaunay triangulation
of the ground points, then planar (linear) interpolation inside each
triangle at cell centers. Cells outside the convex hull stay NA (the
reference relies on buffered chunks so hull edges fall outside the core
tile — the Spark operator reproduces that with a point-halo shuffle,
operators/rasterize.points_to_dtm_tiles).

No scipy in this sandbox (SURVEY.md environment facts), so Delaunay is
implemented here as vectorized Bowyer-Watson: per inserted point the
circumcircle test runs as one numpy broadcast over all live triangles,
giving O(n) numpy passes instead of per-triangle Python loops. Per-tile
ground-point counts (10^2..10^4) keep this comfortably in-budget inside a
pandas UDF; correctness is pinned by the empty-circumcircle property test
(tests/test_tin.py).
"""

from __future__ import annotations

import numpy as np


def _circumcircles(pts: np.ndarray, tris: np.ndarray):
    """Circumcenter + squared radius for each triangle (vectorized).

    Degenerate (collinear) triangles get radius +inf so they swallow every
    candidate point and are re-triangulated away.
    """
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    ab = b - a
    ac = c - a
    d = 2.0 * (ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0])
    with np.errstate(divide="ignore", invalid="ignore"):
        ux = (ac[:, 1] * (ab * ab).sum(1) - ab[:, 1] * (ac * ac).sum(1)) / d
        uy = (ab[:, 0] * (ac * ac).sum(1) - ac[:, 0] * (ab * ab).sum(1)) / d
    centers = a + np.column_stack([ux, uy])
    r2 = ((centers - a) ** 2).sum(1)
    bad = ~np.isfinite(r2)
    r2[bad] = np.inf
    centers[bad] = 0.0
    return centers, r2


def delaunay(points: np.ndarray) -> np.ndarray:
    """Delaunay triangulation of (n, 2) points -> (m, 3) int32 index array.

    Bowyer-Watson with a super-triangle; insertion order is randomized with
    a seed derived from the point coordinates themselves so the result is
    deterministic for identical input regardless of row order upstream.
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int32)

    lo = pts.min(0)
    hi = pts.max(0)
    span = float(max(hi[0] - lo[0], hi[1] - lo[1], 1e-9))
    mid = (lo + hi) / 2.0
    # super-triangle comfortably containing every point
    sup = np.array([
        [mid[0] - 20.0 * span, mid[1] - 10.0 * span],
        [mid[0] + 20.0 * span, mid[1] - 10.0 * span],
        [mid[0], mid[1] + 20.0 * span],
    ])
    allp = np.vstack([pts, sup])
    si = np.array([n, n + 1, n + 2])

    tris = np.array([si], dtype=np.int64)
    centers, r2 = _circumcircles(allp, tris)

    seed = int(np.abs(pts).sum() * 1e3) % (2**31) or 1
    order = np.random.default_rng(seed).permutation(n)

    for idx in order:
        p = allp[idx]
        # vectorized empty-circumcircle violation test over live triangles
        d2 = ((centers - p) ** 2).sum(1)
        bad = d2 <= r2 * (1.0 + 1e-12)
        if not bad.any():
            # numerical corner: point outside every circumcircle (should not
            # happen inside the super-triangle); attach to nearest triangle
            bad = np.zeros(len(tris), dtype=bool)
            bad[int(np.argmin(d2 - r2))] = True
        bad_tris = tris[bad]
        # boundary of the cavity: edges appearing exactly once
        edges = np.concatenate([
            bad_tris[:, [0, 1]], bad_tris[:, [1, 2]], bad_tris[:, [2, 0]],
        ])
        key = np.sort(edges, axis=1)
        _, inv, counts = np.unique(
            key[:, 0] * (n + 3) + key[:, 1], return_inverse=True,
            return_counts=True)
        boundary = edges[counts[inv] == 1]
        new_tris = np.column_stack([
            boundary,
            np.full(len(boundary), idx, dtype=np.int64),
        ])
        tris = np.concatenate([tris[~bad], new_tris])
        new_c, new_r2 = _circumcircles(allp, new_tris)
        centers = np.concatenate([centers[~bad], new_c])
        r2 = np.concatenate([r2[~bad], new_r2])

    keep = (tris < n).all(1)
    return np.sort(tris[keep], axis=1).astype(np.int32)


def tin_interpolate(points: np.ndarray, z: np.ndarray,
                    gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """Linear TIN interpolation of z at grid cell centers.

    gx: (w,) cell-center x coords; gy: (h,) cell-center y coords (descending,
    array row 0 = top, matching the tile codec convention). Returns (h, w)
    float64 with NaN outside the convex hull — the reference leaves
    un-interpolable cells NA (terra semantics) and relies on chunk buffers
    to cover core cells (common.R:105-123).
    """
    pts = np.asarray(points, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    out = np.full((len(gy), len(gx)), np.nan)
    tris = delaunay(pts)
    if len(tris) == 0:
        return out

    gxx, gyy = np.meshgrid(gx, gy)
    for t in tris:
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        xmin = min(a[0], b[0], c[0]); xmax = max(a[0], b[0], c[0])
        ymin = min(a[1], b[1], c[1]); ymax = max(a[1], b[1], c[1])
        jsel = np.where((gx >= xmin) & (gx <= xmax))[0]
        isel = np.where((gy >= ymin) & (gy <= ymax))[0]
        if len(jsel) == 0 or len(isel) == 0:
            continue
        px = gxx[np.ix_(isel, jsel)]
        py = gyy[np.ix_(isel, jsel)]
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if det == 0.0:
            continue
        w0 = ((b[1] - c[1]) * (px - c[0]) + (c[0] - b[0]) * (py - c[1])) / det
        w1 = ((c[1] - a[1]) * (px - c[0]) + (a[0] - c[0]) * (py - c[1])) / det
        w2 = 1.0 - w0 - w1
        eps = -1e-12
        inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps)
        vals = w0 * z[t[0]] + w1 * z[t[1]] + w2 * z[t[2]]
        block = out[np.ix_(isel, jsel)]
        block[inside] = vals[inside]
        out[np.ix_(isel, jsel)] = block
    return out
