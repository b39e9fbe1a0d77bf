"""Statistical helpers pinned to the reference's R semantics.

- R type-7 quantiles (stats::quantile default; coregistration.R:318-319,
  lidR stdmetrics zq*).
- Gini index as reldist::gini (metrics.R:204).
- OLS plane fit -> slope/aspect in gradians (metrics.R:256-316).
- Closed-form simple linear regression + error stats (tree_match.R:303-353).
"""

from __future__ import annotations

import numpy as np


def quantile_type7(x: np.ndarray, q) -> np.ndarray:
    """R type-7 quantile: h = (n-1)q; linear interpolation between order
    stats — identical to numpy's default 'linear' method; pinned here so the
    whole engine shares one definition."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    return np.quantile(x, q, method="linear")


def gini(x: np.ndarray) -> float:
    """Gini index, reldist::gini semantics: sort ascending,
    G = sum((2i - n - 1) x_i) / (n * sum(x))   with i = 1..n."""
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = x.size
    if n == 0 or x.sum() == 0:
        return float("nan")
    i = np.arange(1, n + 1, dtype=np.float64)
    return float(np.sum((2 * i - n - 1) * x) / (n * np.sum(x)))


def plane_metrics(x, y, z, centre=None) -> dict | None:
    """Fit z ~ a + b x + c y; slope/aspect in gradians, adjR2*100, rounded to
    1 decimal (metrics.R:256-316). Altitude = mean of range of z (the
    no-centre branch :307-310) or plane value at centre when provided."""
    x = np.asarray(x, float); y = np.asarray(y, float); z = np.asarray(z, float)
    n = x.size
    if n <= 1:
        return None
    X = np.column_stack([np.ones(n), x, y])
    coef, *_ = np.linalg.lstsq(X, z, rcond=None)
    a, b, c = coef
    resid = z - X @ coef
    ss_res = float(resid @ resid)
    ss_tot = float(((z - z.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else float("nan")
    adj = 1.0 - (1.0 - r2) * (n - 1) / (n - 3) if n > 3 else float("nan")
    slope = np.arctan(np.sqrt(b * b + c * c)) * 400.0 / (2 * np.pi)
    azimut = ((np.pi / 2 - np.arctan2(c, b)) * 400.0 / (2 * np.pi) + 200.0) % 400.0 \
        if abs(slope) > 0 else float("nan")
    if centre is not None:
        altitude = float(a + b * centre[0] + c * centre[1])
    else:
        altitude = float((z.min() + z.max()) / 2.0)
    return {
        "altitude": round(altitude, 1),
        "azimut_gr": round(float(azimut), 1) if np.isfinite(azimut) else None,
        "slope_gr": round(float(slope), 1),
        "adjR2_plane": round(float(adj * 100.0), 1) if np.isfinite(adj) else None,
    }


def height_regression_stats(h_ref: np.ndarray, h_det: np.ndarray) -> dict:
    """lm(Hm ~ Hl) + rmse/bias/sd of (Hl - Hm) (tree_match.R:303-353);
    here Hm = reference (measured), Hl = detected (lidar)."""
    hm = np.asarray(h_ref, float)
    hl = np.asarray(h_det, float)
    n = hm.size
    mx, my = hl.mean(), hm.mean()
    sxx = float(((hl - mx) ** 2).sum())
    sxy = float(((hl - mx) * (hm - my)).sum())
    slope = sxy / sxx if sxx > 0 else float("nan")
    intercept = my - slope * mx
    d = hl - hm
    return {
        "n": int(n),
        "slope": slope,
        "intercept": intercept,
        "rmse": float(np.sqrt(np.mean(d * d))),
        "bias": float(np.mean(d)),
        "sd": float(np.std(d, ddof=1)) if n > 1 else float("nan"),
    }
