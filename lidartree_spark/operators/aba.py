"""Area-based approach (ABA): model calibration, prediction, inference.

Re-derivation of /root/reference/R/aba.R:
- aba_build_model :83-292 — driver-side (n ~ 100 plots): Box-Cox lambda by
  ML grid search (car::powerTransform), exhaustive best-subset OLS up to
  nmax predictors (leaps::regsubsets nbest=20), assumption checks
  (partial p < 0.05, VIF < 5; the gvlma battery is deferred, SURVEY.md §7),
  exact LOOCV via the hat-matrix identity (algebraically equal to the
  reference's n refits :211-220), bias-corrected back-transform, validation
  stats :245-267.
- aba_predict :730-820 — pure Catalyst column expressions per stratum.
- aba_inference :892-1012 — survey estimators as Spark aggregates.

Statistical-test deviations (documented): the paired Wilcoxon p-value uses
the normal approximation with continuity correction (R uses the exact
distribution for small n without ties); the paired t-test p-value is exact
via a continued-fraction incomplete beta.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# small numerics: t CDF via incomplete beta (no scipy in this environment)

def _betacf(a: float, b: float, x: float) -> float:
    MAXIT, EPS, FPMIN = 200, 3e-12, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    ln = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
          + a * math.log(x) + b * math.log(1.0 - x))
    bt = math.exp(ln)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_sf(t: float, df: float) -> float:
    """Two-sided p-value of a t statistic."""
    x = df / (df + t * t)
    return _betainc(df / 2.0, 0.5, x)


def paired_t_pvalue(a: np.ndarray, b: np.ndarray) -> float:
    d = np.asarray(a, float) - np.asarray(b, float)
    n = d.size
    sd = d.std(ddof=1)
    if sd == 0:
        return 1.0
    t = d.mean() / (sd / math.sqrt(n))
    return t_sf(abs(t), n - 1)


def wilcoxon_pvalue(a: np.ndarray, b: np.ndarray) -> float:
    """Paired Wilcoxon signed-rank, normal approximation with continuity
    correction (R's default for larger samples)."""
    d = np.asarray(a, float) - np.asarray(b, float)
    d = d[d != 0]
    n = d.size
    if n == 0:
        return 1.0
    ranks = np.argsort(np.argsort(np.abs(d))) + 1.0
    # average ranks for ties
    absd = np.abs(d)
    order = np.argsort(absd)
    sorted_abs = absd[order]
    avg = np.empty(n)
    i = 0
    while i < n:
        j = i
        while j + 1 < n and sorted_abs[j + 1] == sorted_abs[i]:
            j += 1
        avg[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    w = float(avg[d > 0].sum())
    mu = n * (n + 1) / 4.0
    sigma = math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0)
    if sigma == 0:
        return 1.0
    z = (w - mu - math.copysign(0.5, w - mu)) / sigma
    return math.erfc(abs(z) / math.sqrt(2.0))


# --------------------------------------------------------------------------
# Box-Cox lambda by maximum likelihood (car::powerTransform equivalent)

def chi2_sf(x: float, df: int) -> float:
    """Chi-square survival function for small integer df, closed-form:
    even df -> exp(-x/2) * sum_{k<df/2} (x/2)^k / k!; df=1 -> erfc(sqrt(x/2)).
    Covers the gvlma battery (df 1 for directional stats, 4 for the global
    stat) without a generic incomplete-gamma implementation."""
    if x <= 0:
        return 1.0
    if df == 1:
        return math.erfc(math.sqrt(x / 2.0))
    if df % 2 == 0:
        h = x / 2.0
        term, acc = 1.0, 1.0
        for k in range(1, df // 2):
            term *= h / k
            acc += term
        return math.exp(-h) * acc
    # odd df > 1: recurrence Q(df) = Q(df-2) + pdf-term
    q = math.erfc(math.sqrt(x / 2.0))
    h = math.sqrt(x / 2.0)
    term = 2.0 / math.sqrt(math.pi) * h * math.exp(-x / 2.0)
    for k in range(1, (df - 1) // 2 + 1):
        q += term
        term *= x / (2.0 * k + 1.0)
    return q


def gvlma_tests(X: np.ndarray, y: np.ndarray, alpha: float = 0.1) -> dict:
    """Global validation of linear model assumptions — numpy re-derivation
    of the Pena & Slate (2006) statistics used by gvlma::gvlma as consumed
    in lma_check (/root/reference/R/aba.R:335-344, alphalevel = 0.1):

    - skewness:  S1 = n * b1^2 / 6,            b1 = mean(e_std^3)
    - kurtosis:  S2 = n * (b2 - 3)^2 / 24,     b2 = mean(e_std^4)
    - link:      S3 = score test for adding yhat^2 (residualized vs X)
    - heterosc.: S4 = Cook-Weisberg score test with variance ~ yhat
    - global:    G4 = S1 + S2 + S3 + S4 ~ chi2(4)

    with e_std = e / sqrt(mean(e^2)) (MLE scaling). Each directional stat is
    chi2(1). "acceptable" mirrors gvlma Decision == 0: p > alpha.
    Documented deviation: gvlma's exact heteroscedasticity covariate scaling
    may differ in low-order terms; the decision behavior (violation
    detection at alpha = 0.1) is what lma_check consumes and is pinned by
    tests/test_gvlma.py.
    """
    X = np.asarray(X, float)
    y = np.asarray(y, float)
    n = len(y)
    XtX_inv = np.linalg.inv(X.T @ X)
    coef = XtX_inv @ X.T @ y
    yhat = X @ coef
    e = y - yhat
    s2 = float(e @ e) / n
    estd = e / math.sqrt(s2)

    b1 = float(np.mean(estd ** 3))
    b2 = float(np.mean(estd ** 4))
    s_skew = n * b1 * b1 / 6.0
    s_kurt = n * (b2 - 3.0) ** 2 / 24.0

    # link function: score statistic for the added regressor yhat^2
    q = yhat ** 2
    qstar = q - X @ (XtX_inv @ (X.T @ q))
    qq = float(qstar @ qstar)
    s_link = (float(e @ qstar) ** 2) / (s2 * qq) if qq > 1e-12 else 0.0

    # heteroscedasticity: Cook-Weisberg score with z = yhat (centered)
    g = e * e / s2 - 1.0
    z = yhat - yhat.mean()
    zz = float(z @ z)
    s_het = (float(g @ z) ** 2) / (2.0 * zz) if zz > 1e-12 else 0.0

    g4 = s_skew + s_kurt + s_link + s_het
    stats = {"global": g4, "skewness": s_skew, "kurtosis": s_kurt,
             "link": s_link, "heteroscedasticity": s_het}
    pvals = {k: chi2_sf(v, 4 if k == "global" else 1)
             for k, v in stats.items()}
    return {"stats": stats, "pvalues": pvals,
            "acceptable": all(p > alpha for p in pvals.values())}


def boxcox_lambda_mle(y: np.ndarray, grid=None) -> float:
    y = np.asarray(y, float)
    y = y[np.isfinite(y) & (y > 0)]
    n = y.size
    logy = np.log(y)
    sumlog = logy.sum()
    if grid is None:
        grid = np.arange(-2.0, 2.0001, 0.01)
    best, best_ll = 1.0, -np.inf
    for lam in grid:
        z = (np.power(y, lam) - 1.0) / lam if abs(lam) > 1e-12 else logy
        ss = ((z - z.mean()) ** 2).sum()
        if ss <= 0:
            continue
        ll = -n / 2.0 * math.log(ss / n) + (lam - 1.0) * sumlog
        if ll > best_ll:
            best_ll, best = ll, float(lam)
    return best


def boxcox_tr(x, lam):
    x = np.asarray(x, float)
    return (np.power(x, lam) - 1.0) / lam if abs(lam) > 1e-12 else np.log(x)


def boxcox_itr(x, lam):
    x = np.asarray(x, float)
    return np.power(lam * x + 1.0, 1.0 / lam) if abs(lam) > 1e-12 else np.exp(x)


def boxcox_itr_bias_cor(x, lam, varmod):
    x = np.asarray(x, float)
    if abs(lam) > 1e-12:
        return boxcox_itr(x, lam) * (
            1.0 + (varmod * (1.0 - lam) / (2.0 * (lam * x + 1.0) ** 2)))
    return np.exp(x) * np.exp(varmod / 2.0)


# --------------------------------------------------------------------------
# model calibration

@dataclass
class AbaModel:
    variable: str
    predictors: list
    coefficients: dict           # name -> coef, plus "(Intercept)"
    transform: str               # none | boxcox | log
    lambda_: float
    adjR2: float
    var_res: float
    n: int
    stats: dict = field(default_factory=dict)
    values: dict = field(default_factory=dict)  # field/predicted/residual


def _ols(X: np.ndarray, y: np.ndarray):
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ coef
    return coef, resid


def aba_build_model(pdf, variable: str, predictors: list[str],
                    transform: str = "none", nmax: int = 3,
                    tests=("partial_p", "vif"), nbest: int = 20,
                    threshold=None) -> AbaModel | None:
    """Driver-side calibration on a pandas DataFrame of plot metrics."""
    df = pdf[[variable] + list(predictors)].astype(float).copy()
    df = df[np.isfinite(df[variable]) & (df[variable] > 0)]
    y_raw = df[variable].to_numpy()
    n = len(df)

    lam = float("nan")
    usable = list(predictors)
    if transform == "boxcox":
        lam = boxcox_lambda_mle(y_raw)
        y = boxcox_tr(y_raw, lam)
        Xfull = df[usable].to_numpy()
    elif transform == "log":
        y = np.log(y_raw)
        # drop predictors with non-finite log (aba.R:123-141)
        usable = [p for p in predictors
                  if np.all(np.isfinite(np.log(df[p].to_numpy())))]
        Xfull = np.log(df[usable].to_numpy())
    else:
        y = y_raw.copy()
        Xfull = df[usable].to_numpy()

    # exhaustive best-subset search, sizes 1..nmax, keep nbest per size by R2
    candidates = []
    for k in range(1, min(nmax, len(usable)) + 1):
        per_size = []
        for combo in itertools.combinations(range(len(usable)), k):
            X = np.column_stack([np.ones(n), Xfull[:, combo]])
            coef, resid = _ols(X, y)
            ss_res = float(resid @ resid)
            ss_tot = float(((y - y.mean()) ** 2).sum())
            r2 = 1.0 - ss_res / ss_tot
            per_size.append((r2, combo, coef, resid, ss_res))
        per_size.sort(key=lambda t: -t[0])
        candidates.extend(per_size[:nbest])

    best = None
    for r2, combo, coef, resid, ss_res in candidates:
        k = len(combo)
        adj = 1.0 - (1.0 - r2) * (n - 1) / (n - k - 1)
        X = np.column_stack([np.ones(n), Xfull[:, combo]])
        ok = True
        if "partial_p" in tests:
            # partial t-tests of non-intercept coefficients
            XtX_inv = np.linalg.inv(X.T @ X)
            sigma2 = ss_res / (n - k - 1)
            se = np.sqrt(np.diag(XtX_inv) * sigma2)
            with np.errstate(divide="ignore", invalid="ignore"):
                tvals = coef / se
            pvals = [t_sf(abs(t), n - k - 1) for t in tvals[1:]]
            ok &= max(pvals) < 0.05 if pvals else False
        if ok and "gvlma" in tests:
            # lma_check requires every Pena-Slate decision acceptable at
            # alphalevel 0.1 (aba.R:335-349)
            ok &= gvlma_tests(X, y, alpha=0.1)["acceptable"]
        if ok and "vif" in tests and k > 1:
            Xp = Xfull[:, combo]
            vifs = []
            for j in range(k):
                others = [jj for jj in range(k) if jj != j]
                Xo = np.column_stack([np.ones(n), Xp[:, others]])
                cj, rj = _ols(Xo, Xp[:, j])
                sst = float(((Xp[:, j] - Xp[:, j].mean()) ** 2).sum())
                r2j = 1.0 - float(rj @ rj) / sst if sst > 0 else 0.0
                vifs.append(1.0 / max(1e-12, 1.0 - r2j))
            ok &= max(vifs) < 5.0
        if ok and (best is None or adj > best[0]):
            best = (adj, combo, coef, ss_res)
    if best is None:
        return None

    adj, combo, coef, ss_res = best
    names = [usable[i] for i in combo]
    k = len(combo)
    X = np.column_stack([np.ones(n), Xfull[:, combo]])
    var_res = ss_res / (n - k - 1)

    # exact LOOCV via hat-matrix identity (== the reference's refit loop)
    H = X @ np.linalg.inv(X.T @ X) @ X.T
    h = np.diag(H)
    yhat = X @ coef
    e = y - yhat
    loo_pred = yhat - h * e / (1.0 - h)
    sse_loo = ss_res - e * e / (1.0 - h)
    var_res_loo = sse_loo / (n - 1 - k - 1)

    if transform == "boxcox":
        prediction = boxcox_itr_bias_cor(loo_pred, lam, var_res_loo)
    elif transform == "log":
        prediction = np.exp(loo_pred) * np.exp(var_res_loo / 2.0)
    else:
        prediction = loo_pred
    if threshold is not None:
        prediction = np.clip(np.nan_to_num(prediction, nan=threshold[0],
                                           posinf=threshold[1],
                                           neginf=threshold[0]),
                             threshold[0], threshold[1])

    rmse = float(np.sqrt(np.mean((prediction - y_raw) ** 2)))
    stats = {
        "n": n,
        "formula": "+".join(names),
        "adjR2": float(adj),
        "transform": transform,
        "lambda": lam,
        "rmse": rmse,
        "cvrmse": rmse / float(np.mean(y_raw)),
        "pwil": wilcoxon_pvalue(prediction, y_raw),
        "pttest": paired_t_pvalue(prediction, y_raw),
        "cor": float(np.corrcoef(y_raw, prediction)[0, 1]),
        "looR2": 1.0 - float(((prediction - y_raw) ** 2).sum()
                             / ((y_raw - y_raw.mean()) ** 2).sum()),
        "var_res": float(var_res),
    }
    return AbaModel(
        variable=variable, predictors=names,
        coefficients={"(Intercept)": float(coef[0]),
                      **{nm: float(c) for nm, c in zip(names, coef[1:])}},
        transform=transform, lambda_=lam, adjR2=float(adj),
        var_res=float(var_res), n=n, stats=stats,
        values={"field": y_raw.tolist(), "predicted": prediction.tolist(),
                "residual": (y_raw - prediction).tolist()},
    )


# --------------------------------------------------------------------------
# prediction: pure Catalyst column expressions (aba.R:730-820)

def aba_combine_strata(models: dict[str, AbaModel]) -> dict:
    """Merge per-stratum models into one summary (aba_combine_strata,
    /root/reference/R/aba.R:554-611): per-stratum stats rows plus a
    COMBINED row with pooled rmse = sqrt(mean(residual^2)), cvrmse =
    rmse/mean(field), Wilcoxon/t p-values of the pooled residuals,
    cor(field, predicted), and pooled looR2 = 1 - SSres/SStot (:572-596).
    Also returns the concatenated values table with a stratum column."""
    rows = {}
    field, pred, resid, strat = [], [], [], []
    for name, m in models.items():
        rows[name] = dict(m.stats)
        field.extend(m.values["field"])
        pred.extend(m.values["predicted"])
        resid.extend(m.values["residual"])
        strat.extend([name] * len(m.values["field"]))
    f = np.asarray(field, float)
    p = np.asarray(pred, float)
    r = np.asarray(resid, float)
    rmse = float(np.sqrt(np.mean(r * r)))
    rows["COMBINED"] = {
        "n": int(len(f)),
        "rmse": rmse,
        "cvrmse": rmse / float(np.mean(f)),
        "pwil": wilcoxon_pvalue(p, f),
        "pttest": paired_t_pvalue(p, f),
        "cor": float(np.corrcoef(f, p)[0, 1]),
        "looR2": 1.0 - float((r * r).sum() / ((f - f.mean()) ** 2).sum()),
    }
    return {"models": models, "stats": rows,
            "values": {"field": f.tolist(), "predicted": p.tolist(),
                       "residual": r.tolist(), "stratum": strat}}


def aba_predict_expr(model: AbaModel) -> Column:
    """Prediction column for a metrics DataFrame, with the model's transform
    and bias-corrected back-transform."""
    lin = F.lit(model.coefficients["(Intercept)"])
    for name in model.predictors:
        c = F.col(name)
        if model.transform == "log":
            c = F.log(c)
        lin = lin + F.lit(model.coefficients[name]) * c
    if model.transform == "boxcox":
        lam, v = model.lambda_, model.var_res
        base = F.pow(F.lit(lam) * lin + F.lit(1.0), F.lit(1.0 / lam))
        corr = (F.lit(1.0) + F.lit(v * (1.0 - lam))
                / (F.lit(2.0) * F.pow(F.lit(lam) * lin + F.lit(1.0), F.lit(2.0))))
        return base * corr
    if model.transform == "log":
        return F.exp(lin) * F.lit(math.exp(model.var_res / 2.0))
    return lin


def aba_predict(metrics: DataFrame, models: dict[str, AbaModel],
                stratum_col: str | None = None,
                prediction_col: str = "prediction") -> DataFrame:
    """Apply per-stratum models; single model under key 'all' when
    stratum_col is None (aba.R:740-747, merge :808-813)."""
    if stratum_col is None:
        return metrics.withColumn(prediction_col,
                                  aba_predict_expr(models["all"]))
    expr = None
    for name, model in models.items():
        branch = aba_predict_expr(model)
        expr = (F.when(F.col(stratum_col) == name, branch) if expr is None
                else expr.when(F.col(stratum_col) == name, branch))
    return metrics.withColumn(prediction_col, expr)


# --------------------------------------------------------------------------
# inference estimators (aba.R:892-1012) as aggregates

def aba_inference(predictions: DataFrame, model: AbaModel,
                  prediction_col: str = "prediction",
                  stratum_col: str | None = None,
                  types=("SRS", "ED", "D", "SYNT")) -> dict:
    """Survey estimators. `predictions` is the wall-to-wall prediction table
    (one row per cell/plot); observations come from the model's values."""
    obs_field = np.array(model.values["field"])
    obs_pred = np.array(model.values["predicted"])
    n = obs_field.size
    n_para = len(model.predictors) + 1
    agg = predictions.agg(
        F.count(prediction_col).alias("N"),
        F.avg(prediction_col).alias("mean_pred"),
        F.sum(prediction_col).alias("sum_pred"),
    ).collect()[0]
    out = {}
    if "SRS" in types:
        out["SRS"] = {"mean": float(obs_field.mean()),
                      "var": float(obs_field.var(ddof=1))}
    bias = float((obs_pred - obs_field).mean())
    var_d = float((((obs_pred - obs_field) - bias) ** 2).sum() / (n - n_para))
    if "ED" in types:
        out["ED"] = {"mean": float(agg.mean_pred) - bias, "var": var_d}
    if "D" in types:
        out["D"] = {
            "mean": (float(obs_field.sum())
                     + float(agg.sum_pred) - float(obs_pred.sum())) / agg.N
                    - bias,
            "var": var_d,
        }
    if "SYNT" in types:
        out["SYNT"] = {"mean": float(agg.mean_pred), "var": float("nan")}
    if "STR" in types and stratum_col is not None:
        # stratified estimator (aba.R:971-1000): pixel-share weights W_i
        # from the prediction table, per-stratum mean/var from the
        # observations (obs strata supplied as model.values["stratum"],
        # the analogue of extracting r_mask at the obs coordinates);
        # mean = sum(W_i * m_i), var = sum((var_i * W_i)^2 / n_i) —
        # the reference's exact expression, quirky squaring included
        strata = predictions.groupBy(stratum_col).agg(
            F.count("*").alias("n_pix")).collect()
        tot = sum(r.n_pix for r in strata)
        weights = {r[stratum_col]: r.n_pix / tot for r in strata}
        obs_strata = model.values.get("stratum")
        if obs_strata is None:
            out["STR"] = {"weights": weights}
        elif set(weights) != set(obs_strata):
            import warnings
            warnings.warn("Impossible to compute STR inference: categories "
                          "not present in both observations and pixels",
                          stacklevel=2)
        else:
            obs_strata = np.asarray(obs_strata)
            mean = var = 0.0
            for s, w in weights.items():
                sel = obs_field[obs_strata == s]
                mean += w * float(sel.mean())
                var += (float(sel.var(ddof=1)) * w) ** 2 / sel.size
            out["STR"] = {"mean": mean, "var": var, "weights": weights}
    for v in out.values():
        if "var" in v and v["var"] == v["var"]:
            v["sd"] = math.sqrt(v["var"])
    return out
