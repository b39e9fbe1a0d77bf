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
with slot-reused storage and a 1-D circumcenter prefilter. Per-tile
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

    Storage is slot-based: triangle/circumcircle arrays are preallocated
    and cavity slots are reused in place (dead slots carry r2 = -1, which
    no d2 >= 0 can trigger), so an insertion costs one vectorized
    circumcircle scan plus O(cavity) bookkeeping — no per-insert
    concatenate/compact of the full triangle set. ~5x over the rebuild
    formulation at 4k points/tile.
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int32)

    lo = pts.min(0)
    hi_pt = pts.max(0)
    span = float(max(hi_pt[0] - lo[0], hi_pt[1] - lo[1], 1e-9))
    mid = (lo + hi_pt) / 2.0
    # super-triangle comfortably containing every point
    sup = np.array([
        [mid[0] - 20.0 * span, mid[1] - 10.0 * span],
        [mid[0] + 20.0 * span, mid[1] - 10.0 * span],
        [mid[0], mid[1] + 20.0 * span],
    ])
    allp = np.vstack([pts, sup])

    cap = 4 * n + 16
    tris = np.zeros((cap, 3), dtype=np.int64)
    cx = np.zeros(cap)
    cy = np.zeros(cap)
    # rr = circumradius^2 * (1 + 1e-12) for live slots, -1 for dead —
    # pre-scaled so the hot loop compares without a multiply pass
    rr = np.full(cap, -1.0)
    tris[0] = (n, n + 1, n + 2)
    (c0,), (rr0,) = _circumcircles(allp, tris[:1])
    cx[0], cy[0] = c0
    rr[0] = rr0 * (1.0 + 1e-12)
    hi = 1  # slot watermark

    seed = int(np.abs(pts).sum() * 1e3) % (2**31) or 1
    order = np.random.default_rng(seed).permutation(n)

    for idx in order:
        px, py = allp[idx]
        # vectorized empty-circumcircle violation test over live slots,
        # with a 1-D prefilter: |cx - px|^2 alone already exceeds rr for
        # the vast majority of slots (circumradii are local), so the full
        # distance runs only on the survivors
        dx2 = (cx[:hi] - px) ** 2
        cand = np.nonzero(dx2 <= rr[:hi])[0]
        if cand.size:
            d2c = dx2[cand] + (cy[cand] - py) ** 2
            bad_idx = cand[d2c <= rr[cand]]
        else:
            bad_idx = cand
        if bad_idx.size == 0:
            # numerical corner: point outside every circumcircle (should not
            # happen inside the super-triangle); attach to nearest triangle
            d2 = dx2 + (cy[:hi] - py) ** 2
            score = np.where(rr[:hi] >= 0.0, d2 - rr[:hi], np.inf)
            bad_idx = np.array([int(np.argmin(score))])
        bad_tris = tris[bad_idx]
        # boundary of the cavity: edges appearing exactly once
        edges = np.concatenate([
            bad_tris[:, [0, 1]], bad_tris[:, [1, 2]], bad_tris[:, [2, 0]],
        ])
        key = np.sort(edges, axis=1)
        _, inv, counts = np.unique(
            key[:, 0] * (n + 3) + key[:, 1], return_inverse=True,
            return_counts=True)
        boundary = edges[counts[inv] == 1]
        m = len(boundary)
        new_tris = np.column_stack([
            boundary,
            np.full(m, idx, dtype=np.int64),
        ])
        new_c, new_r2 = _circumcircles(allp, new_tris)
        k = bad_idx.size
        if m <= k:
            slots = bad_idx[:m]
            rr[bad_idx[m:]] = -1.0  # cavity slots left over: mark dead
        else:
            if hi + m - k > cap:
                grow = max(cap, hi + m - k)
                tris = np.concatenate([tris, np.zeros((grow, 3), np.int64)])
                cx = np.concatenate([cx, np.zeros(grow)])
                cy = np.concatenate([cy, np.zeros(grow)])
                rr = np.concatenate([rr, np.full(grow, -1.0)])
                cap += grow
            slots = np.concatenate([bad_idx,
                                    np.arange(hi, hi + m - k)])
            hi += m - k
        tris[slots] = new_tris
        cx[slots] = new_c[:, 0]
        cy[slots] = new_c[:, 1]
        rr[slots] = new_r2 * (1.0 + 1e-12)

    live = tris[:hi][rr[:hi] >= 0.0]
    keep = (live < n).all(1)
    return np.sort(live[keep], axis=1).astype(np.int32)


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

    # Fully vectorized rasterization: expand each triangle's bbox into
    # (triangle, cell) pairs, evaluate barycentric weights for every pair
    # in one pass, scatter the inside hits. Pair count ~= sum of bbox
    # areas, a small multiple of the grid size for a Delaunay mesh —
    # replaces the per-triangle Python loop (~2n iterations/tile).
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    xs = np.stack([a[:, 0], b[:, 0], c[:, 0]])
    ys = np.stack([a[:, 1], b[:, 1], c[:, 1]])
    gyr = gy[::-1]  # gy is descending (row 0 = top); searchsorted wants asc
    H = len(gy)
    j0 = np.searchsorted(gx, xs.min(0), side="left")
    j1 = np.searchsorted(gx, xs.max(0), side="right")
    i0 = np.searchsorted(gyr, ys.min(0), side="left")
    i1 = np.searchsorted(gyr, ys.max(0), side="right")
    nx = np.maximum(j1 - j0, 0)
    ny = np.maximum(i1 - i0, 0)
    counts = nx * ny
    det = ((b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0])
           + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1]))
    counts[det == 0.0] = 0  # degenerate: contributes nothing
    total = int(counts.sum())
    if total == 0:
        return out

    tri_id = np.repeat(np.arange(len(tris)), counts)
    start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    k = np.arange(total) - start[tri_id]
    col = j0[tri_id] + k % nx[tri_id]
    row = H - 1 - (i0[tri_id] + k // nx[tri_id])
    px = gx[col]
    py = gy[row]

    at, bt, ct = a[tri_id], b[tri_id], c[tri_id]
    dt = det[tri_id]
    w0 = ((bt[:, 1] - ct[:, 1]) * (px - ct[:, 0])
          + (ct[:, 0] - bt[:, 0]) * (py - ct[:, 1])) / dt
    w1 = ((ct[:, 1] - at[:, 1]) * (px - ct[:, 0])
          + (at[:, 0] - ct[:, 0]) * (py - ct[:, 1])) / dt
    w2 = 1.0 - w0 - w1
    eps = -1e-12
    inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps)
    vals = (w0 * z[tris[tri_id, 0]] + w1 * z[tris[tri_id, 1]]
            + w2 * z[tris[tri_id, 2]])
    # duplicate (row, col) hits on shared edges agree up to fp noise;
    # fancy assignment keeps the last, matching the old loop's
    # triangle-order tie-break (tri_id is ascending)
    out[row[inside], col[inside]] = vals[inside]
    return out
