"""Greedy 1-to-1 tree matching — exact re-derivation of
/root/reference/R/tree_match.R:47-103 (tree_matching) and :201-232
(hist_detection).
"""

from __future__ import annotations

import numpy as np


def tree_matching(
    lr: np.ndarray,
    ld: np.ndarray,
    delta_ground: float = 2.1,
    h_prec: float = 0.14,
    stat: bool = True,
) -> list[dict]:
    """Greedy min-cost assignment of detected to reference trees.

    Cost matrix: 3D squared distance normalized by the height-dependent max
    matching radius of the REFERENCE tree
    ``rmax^2 = dg^2 + 2*dg*hp*H + hp^2*H^2`` (tree_match.R:51-60,69-73);
    entries >= 1 are clamped (:78); pairs picked iteratively at the global
    minimum, removing the pair's row and column (:85-93). Tie-break: the
    first minimum in column-major order of the shrunken matrix — i.e. the
    smallest remaining REFERENCE index, then smallest detected index (:88).

    lr/ld: (n, 3) arrays of x, y, height. Returns list of dicts with 1-based
    indices r, d (+ h_diff, plan_diff when stat=True), matching the R output.
    """
    lr = np.asarray(lr, dtype=np.float64).reshape(-1, 3)
    ld = np.asarray(ld, dtype=np.float64).reshape(-1, 3)
    nr, nd = lr.shape[0], ld.shape[0]
    if nr == 0 or nd == 0:
        return []
    norm_f = (delta_ground ** 2
              + 2.0 * h_prec * delta_ground * lr[:, 2]
              + h_prec ** 2 * lr[:, 2] ** 2)  # per-reference rmax^2 (:60)
    # dn[d, r] = squared 3D distance / norm_f[r]
    diff = ld[:, None, :] - lr[None, :, :]
    d2 = np.sum(diff * diff, axis=2)  # (nd, nr)
    dn = d2 / norm_f[None, :]
    dn = np.minimum(dn, 1.0)  # clamp (:78)

    det_alive = np.ones(nd, dtype=bool)
    ref_alive = np.ones(nr, dtype=bool)
    matched = []
    while True:
        sub = dn[np.ix_(det_alive, ref_alive)]
        if sub.size == 0:
            break
        mn = sub.min()
        if mn >= 1.0:
            break
        det_idx_alive = np.nonzero(det_alive)[0]
        ref_idx_alive = np.nonzero(ref_alive)[0]
        # column-major first minimum: smallest ref (col), then smallest det (row)
        cols, rows = np.nonzero((sub == mn).T)
        c, r = cols[0], rows[0]
        ref_i = int(ref_idx_alive[c])
        det_i = int(det_idx_alive[r])
        row = {"r": ref_i + 1, "d": det_i + 1}
        if stat:
            row["h_diff"] = float(ld[det_i, 2] - lr[ref_i, 2])
            row["plan_diff"] = float(np.hypot(ld[det_i, 0] - lr[ref_i, 0],
                                              ld[det_i, 1] - lr[ref_i, 1]))
        matched.append(row)
        det_alive[det_i] = False
        ref_alive[ref_i] = False
    return matched


def hist_detection(nr: int, nd: int, matched: list[dict]) -> dict:
    """Detection confusion counts (tree_match.R:201-232)."""
    tp = len(matched)
    return {
        "true_detections": tp,
        "false_detections": nd - tp,
        "omissions": nr - tp,
    }
