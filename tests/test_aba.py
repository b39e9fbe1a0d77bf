"""ABA model calibration / prediction / inference tests."""

import math

import numpy as np
import pandas as pd
import pytest

from lidartree_spark.generator import gen_plot_metrics
from lidartree_spark.operators.aba import (
    AbaModel,
    aba_build_model,
    aba_inference,
    aba_predict,
    boxcox_itr,
    boxcox_itr_bias_cor,
    boxcox_lambda_mle,
    boxcox_tr,
    paired_t_pvalue,
    t_sf,
    wilcoxon_pvalue,
)

PREDICTORS = ["zmax", "zmean", "zsd", "zq95", "mCH", "sdCH", "p_hmin"]


@pytest.fixture(scope="module")
def plots():
    return pd.DataFrame(gen_plot_metrics(96))


def test_t_sf_known_values():
    # two-sided p of t=2.0, df=10 is ~0.0734 (R: 2*pt(-2, 10))
    assert t_sf(2.0, 10) == pytest.approx(0.07338803, abs=1e-5)
    assert t_sf(0.0, 5) == pytest.approx(1.0)


def test_boxcox_roundtrip():
    x = np.array([1.0, 2.0, 5.0, 10.0])
    for lam in (0.0, 0.3, 1.0, -0.5):
        assert np.allclose(boxcox_itr(boxcox_tr(x, lam), lam), x)
    # bias correction increases predictions for positive variance
    assert (boxcox_itr_bias_cor(x, 0.3, 2.0) > boxcox_itr(x, 0.3)).all()


def test_boxcox_lambda_mle_recovers():
    rng = np.random.default_rng(3)
    z = rng.normal(10, 1, 4000)
    y = np.power(0.5 * z + 1, 2.0)  # true lambda = 0.5
    lam = boxcox_lambda_mle(y)
    assert lam == pytest.approx(0.5, abs=0.1)


def test_loocv_closed_form_equals_refit(plots):
    """The hat-matrix LOOCV must equal the reference's explicit refit loop
    (aba.R:211-220)."""
    m = aba_build_model(plots, "G_m2_ha", PREDICTORS, transform="none",
                        nmax=2)
    assert m is not None
    names = m.predictors
    df = plots
    y = df["G_m2_ha"].to_numpy(float)
    X = np.column_stack([np.ones(len(df))] + [df[nm].to_numpy(float)
                                              for nm in names])
    preds = []
    for i in range(len(df)):
        mask = np.arange(len(df)) != i
        coef, *_ = np.linalg.lstsq(X[mask], y[mask], rcond=None)
        preds.append(float(X[i] @ coef))
    got = np.array(m.values["predicted"])
    assert np.allclose(got, preds, rtol=1e-8)


def test_build_model_finds_signal(plots):
    m = aba_build_model(plots, "G_m2_ha", PREDICTORS, transform="none",
                        nmax=3)
    assert m.adjR2 > 0.7           # the generator plants a strong signal
    assert m.stats["looR2"] > 0.6
    assert 0 < m.stats["cvrmse"] < 0.3
    assert "zmean" in m.predictors or "mCH" in m.predictors
    # non-significant-model guard: pure-noise target returns weak/None
    noise = plots.copy()
    rng = np.random.default_rng(0)
    noise["G_m2_ha"] = rng.uniform(10, 20, len(noise))
    m2 = aba_build_model(noise, "G_m2_ha", PREDICTORS, nmax=2)
    assert m2 is None or m2.adjR2 < 0.2


def test_build_model_boxcox_and_log(plots):
    mb = aba_build_model(plots, "G_m2_ha", PREDICTORS, transform="boxcox",
                         nmax=2)
    ml = aba_build_model(plots, "G_m2_ha", PREDICTORS, transform="log",
                         nmax=2)
    for m in (mb, ml):
        assert m is not None
        assert m.stats["rmse"] > 0
        assert abs(np.mean(m.values["residual"])) < 5.0
    assert not math.isnan(mb.lambda_)


def test_predict_and_inference(spark, plots):
    m = aba_build_model(plots, "G_m2_ha", PREDICTORS, transform="none",
                        nmax=3)
    sdf = spark.createDataFrame(plots)
    pred = aba_predict(sdf, {"all": m})
    pdf = pred.select("G_m2_ha", "prediction").toPandas()
    # predictions correlate strongly with the field values
    assert np.corrcoef(pdf.G_m2_ha, pdf.prediction)[0, 1] > 0.85
    inf = aba_inference(pred, m, types=("SRS", "ED", "D", "SYNT"))
    srs, ed = inf["SRS"], inf["ED"]
    assert srs["mean"] == pytest.approx(plots.G_m2_ha.mean())
    assert srs["var"] == pytest.approx(plots.G_m2_ha.var(ddof=1))
    # model-assisted estimators agree with SRS within a few units
    assert abs(ed["mean"] - srs["mean"]) < 5.0
    assert ed["sd"] < math.sqrt(srs["var"])  # model reduces variance
    assert inf["SYNT"]["mean"] == pytest.approx(float(pdf.prediction.mean()))


def test_inference_str_two_strata_hand_computation(spark):
    """STR estimator == the aba.R:971-1000 formulas on a two-strata corpus:
    mean = sum(W_i m_i), var = sum((v_i W_i)^2 / n_i) with W from pixel
    shares and m/v/n from the observations."""
    field = np.array([10.0, 12.0, 14.0, 20.0, 22.0, 26.0])
    model = AbaModel(
        variable="G", predictors=["zmean"],
        coefficients={"(Intercept)": 0.0, "zmean": 1.0}, transform="none",
        lambda_=float("nan"), adjR2=1.0, var_res=0.0, n=6,
        values={"field": field.tolist(), "predicted": field.tolist(),
                "stratum": ["a", "a", "a", "b", "b", "b"]})
    pred = spark.createDataFrame(pd.DataFrame({
        "prediction": np.arange(10.0),
        "stratum": ["a"] * 7 + ["b"] * 3}))
    out = aba_inference(pred, model, stratum_col="stratum",
                        types=("SRS", "STR"))
    wa, wb = 0.7, 0.3
    ma, mb = field[:3].mean(), field[3:].mean()
    va, vb = field[:3].var(ddof=1), field[3:].var(ddof=1)
    assert out["STR"]["weights"] == pytest.approx({"a": wa, "b": wb})
    assert out["STR"]["mean"] == pytest.approx(wa * ma + wb * mb)
    assert out["STR"]["var"] == pytest.approx(
        (va * wa) ** 2 / 3 + (vb * wb) ** 2 / 3)
    assert out["STR"]["sd"] == pytest.approx(math.sqrt(out["STR"]["var"]))

    # category mismatch -> reference behavior: warning, STR omitted
    model.values["stratum"] = ["a", "a", "a", "x", "x", "x"]
    with pytest.warns(UserWarning, match="STR inference"):
        out2 = aba_inference(pred, model, stratum_col="stratum",
                             types=("STR",))
    assert "STR" not in out2

    # no obs strata supplied -> weights-only fallback (pre-existing API)
    del model.values["stratum"]
    out3 = aba_inference(pred, model, stratum_col="stratum", types=("STR",))
    assert out3["STR"] == {"weights": {"a": pytest.approx(wa),
                                       "b": pytest.approx(wb)}}


def test_predict_stratified(spark, plots):
    models = {}
    for s in ("public", "private"):
        models[s] = aba_build_model(plots[plots.stratum == s], "G_m2_ha",
                                    PREDICTORS, nmax=2)
    sdf = spark.createDataFrame(plots)
    pred = aba_predict(sdf, models, stratum_col="stratum").toPandas()
    assert pred.prediction.notna().all()


def test_pvalue_helpers():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 1, 60)
    assert paired_t_pvalue(a, a + rng.normal(0, 0.01, 60)) > 0.01
    assert paired_t_pvalue(a, a + 1.0) < 1e-10
    assert wilcoxon_pvalue(a, a + 1.0) < 1e-6
    assert wilcoxon_pvalue(a, a + rng.normal(0, 0.001, 60)) > 0.001
