"""gvlma battery (Pena & Slate 2006 re-derivation) + chi2 survival
function tests."""

import numpy as np
import pytest

from lidartree_spark.operators.aba import aba_build_model, chi2_sf, gvlma_tests


def test_chi2_sf_known_values():
    # canonical critical values: P(X > x) = 0.05 / 0.10
    assert chi2_sf(3.841459, 1) == pytest.approx(0.05, abs=1e-5)
    assert chi2_sf(2.705543, 1) == pytest.approx(0.10, abs=1e-5)
    assert chi2_sf(9.487729, 4) == pytest.approx(0.05, abs=1e-5)
    assert chi2_sf(5.991465, 2) == pytest.approx(0.05, abs=1e-5)
    assert chi2_sf(7.814728, 3) == pytest.approx(0.05, abs=1e-5)
    assert chi2_sf(0.0, 4) == 1.0


def _design(n, rng):
    x1 = rng.uniform(0, 10, n)
    x2 = rng.uniform(0, 5, n)
    X = np.column_stack([np.ones(n), x1, x2])
    return X, x1, x2


def test_gvlma_clean_model_acceptable():
    """Well-specified homoscedastic normal model -> all five decisions
    acceptable (matches gvlma Decision == 0 on such data)."""
    rng = np.random.default_rng(42)
    X, x1, x2 = _design(200, rng)
    y = 3.0 + 2.0 * x1 - 1.5 * x2 + rng.normal(0, 1.0, 200)
    out = gvlma_tests(X, y)
    assert out["acceptable"]
    assert out["pvalues"]["global"] > 0.1
    assert out["stats"]["global"] == pytest.approx(
        sum(v for k, v in out["stats"].items() if k != "global"))


def test_gvlma_detects_skewed_errors():
    rng = np.random.default_rng(7)
    X, x1, x2 = _design(300, rng)
    y = 3.0 + 2.0 * x1 - 1.5 * x2 + rng.exponential(2.0, 300)
    out = gvlma_tests(X, y)
    assert out["pvalues"]["skewness"] < 0.1
    assert not out["acceptable"]


def test_gvlma_detects_heteroscedasticity():
    rng = np.random.default_rng(13)
    n = 400
    x1 = rng.uniform(1, 10, n)
    X = np.column_stack([np.ones(n), x1])
    y = 1.0 + 2.0 * x1 + rng.normal(0, 0.3 * x1 * x1, n)
    out = gvlma_tests(X, y)
    assert out["pvalues"]["heteroscedasticity"] < 0.1


def test_gvlma_detects_link_misspecification():
    rng = np.random.default_rng(29)
    n = 300
    x1 = rng.uniform(0, 6, n)
    X = np.column_stack([np.ones(n), x1])
    y = np.exp(0.8 * x1) + rng.normal(0, 0.5, n)  # strongly nonlinear mean
    out = gvlma_tests(X, y)
    assert out["pvalues"]["link"] < 0.1


def test_aba_build_model_with_gvlma_gate():
    """With the gvlma test enabled, calibration on clean synthetic plots
    still returns a model (clean data passes the battery)."""
    import pandas as pd
    rng = np.random.default_rng(5)
    n = 96
    zmax = rng.uniform(15, 40, n)
    zmean = rng.uniform(8, 25, n)
    g = 2.0 + 1.1 * zmean + 0.4 * zmax + rng.normal(0, 1.0, n)
    pdf = pd.DataFrame({"G_m2_ha": g, "zmax": zmax, "zmean": zmean})
    model = aba_build_model(pdf, "G_m2_ha", ["zmax", "zmean"],
                            tests=("partial_p", "vif", "gvlma"))
    assert model is not None
    assert set(model.predictors) == {"zmax", "zmean"}
    assert model.adjR2 > 0.9


def test_aba_combine_strata():
    """Combined stats row: pooled rmse/cvrmse/looR2 over both strata's
    LOOCV values, per-stratum rows preserved (aba.R:554-611)."""
    import pandas as pd
    from lidartree_spark.operators.aba import aba_combine_strata

    rng = np.random.default_rng(11)
    models = {}
    for stratum, slope in (("public", 1.2), ("private", 0.8)):
        n = 60
        zmax = rng.uniform(15, 40, n)
        g = 3.0 + slope * zmax + rng.normal(0, 1.0, n)
        pdf = pd.DataFrame({"G": g, "zmax": zmax})
        m = aba_build_model(pdf, "G", ["zmax"])
        assert m is not None
        models[stratum] = m

    combined = aba_combine_strata(models)
    st = combined["stats"]
    assert set(st) == {"public", "private", "COMBINED"}
    n_tot = st["public"]["n"] + st["private"]["n"]
    assert st["COMBINED"]["n"] == n_tot
    resid = np.asarray(combined["values"]["residual"])
    field = np.asarray(combined["values"]["field"])
    assert st["COMBINED"]["rmse"] == pytest.approx(
        float(np.sqrt(np.mean(resid ** 2))))
    assert st["COMBINED"]["looR2"] == pytest.approx(
        1 - float((resid ** 2).sum() / ((field - field.mean()) ** 2).sum()))
    assert 0.9 < st["COMBINED"]["looR2"] <= 1.0
    assert len(combined["values"]["stratum"]) == n_tot
