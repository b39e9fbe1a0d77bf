"""Distributed tree matching: grid-bucketed candidate pruning + cogrouped
greedy assignment, plus confusion counts and height regression aggregates.

Scale design (SURVEY.md §2.6): the greedy assignment is inherently sequential
per group but groups are small (one tile/plot: ~10 trees), so the engine
shuffles once on the group key and runs the exact reference loop in numpy
inside applyInPandas cogroup. The group key IS the skew unit — at 10^12 tiles
keys are near-uniform (synthetic grid) and AQE skew-join covers hot spots.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MATCH_SCHEMA = ("image_id string, r long, d long, h_diff double, "
                "plan_diff double")


def match_trees(ref: DataFrame, det: DataFrame,
                delta_ground: float = 2.1, h_prec: float = 0.14,
                key: str = "image_id") -> DataFrame:
    """Greedy min-cost 1-to-1 matching per group (exact tree_match.R:47-103
    semantics incl. tie-break; see kernels.matching). `ref` needs columns
    (key, tree_id, x, y, h); `det` needs (key, id, x, y, h).
    Output r/d are the 1-based within-group indices in input order (sorted by
    tree_id / id for determinism), matching the reference's row indices."""

    def run(key_tuple, ref_pdf: pd.DataFrame, det_pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        from lidartree_spark.kernels.matching import tree_matching
        if ref_pdf.empty or det_pdf.empty:
            return pd.DataFrame(columns=["image_id", "r", "d", "h_diff",
                                         "plan_diff"])
        ref_pdf = ref_pdf.sort_values("tree_id").reset_index(drop=True)
        det_pdf = det_pdf.sort_values("id").reset_index(drop=True)
        lr = ref_pdf[["x", "y", "h"]].to_numpy()
        ld = det_pdf[["x", "y", "h"]].to_numpy()
        m = tree_matching(lr, ld, delta_ground=delta_ground, h_prec=h_prec)
        return pd.DataFrame([{
            "image_id": key_tuple[0],
            "r": int(p["r"]), "d": int(p["d"]),
            "h_diff": p["h_diff"], "plan_diff": p["plan_diff"],
        } for p in m], columns=["image_id", "r", "d", "h_diff", "plan_diff"])

    return (ref.select(key, "tree_id", "x", "y", "h").groupBy(key)
            .cogroup(det.select(key, "id", "x", "y", "h").groupBy(key))
            .applyInPandas(run, schema=MATCH_SCHEMA))


def detection_counts(ref: DataFrame, det: DataFrame, matched: DataFrame,
                     key: str = "image_id") -> DataFrame:
    """hist_detection confusion counts per group (tree_match.R:201-232) as
    pure aggregates: TP = matches, FN = refs - TP, FP = dets - TP."""
    tp = matched.groupBy(key).agg(F.count("*").alias("true_detections"))
    nr = ref.groupBy(key).agg(F.count("*").alias("n_ref"))
    nd = det.groupBy(key).agg(F.count("*").alias("n_det"))
    return (nr.join(nd, key, "full").join(tp, key, "left")
            .na.fill(0, ["true_detections", "n_ref", "n_det"])
            .select(
                key,
                F.col("true_detections"),
                (F.col("n_det") - F.col("true_detections")).alias("false_detections"),
                (F.col("n_ref") - F.col("true_detections")).alias("omissions")))


def height_regression(matched: DataFrame, ref: DataFrame, det: DataFrame,
                      key: str = "image_id") -> DataFrame:
    """Closed-form lm(Hm ~ Hl) + rmse/bias/sd over all matched pairs
    (tree_match.R:303-353) — one aggregate query, no UDF. `matched` carries
    h_diff = Hl - Hm, so stats need only that column plus joined heights."""
    # reconstruct pair heights by joining on within-group indices
    r_idx = ref.select(
        key, "x", "y", "h",
        F.row_number().over(_w(key, "tree_id")).alias("r")).withColumnRenamed("h", "h_ref")
    d_idx = det.select(
        key, "x", "y", "h",
        F.row_number().over(_w(key, "id")).alias("d")).withColumnRenamed("h", "h_det")
    pairs = (matched.join(r_idx.select(key, "r", "h_ref"), [key, "r"])
             .join(d_idx.select(key, "d", "h_det"), [key, "d"]))
    n = F.count("*")
    mx, my = F.avg("h_det"), F.avg("h_ref")
    sxy = F.avg(F.col("h_det") * F.col("h_ref")) - mx * my
    sxx = F.avg(F.col("h_det") * F.col("h_det")) - mx * mx
    d = F.col("h_det") - F.col("h_ref")
    return pairs.agg(
        n.alias("n"),
        (sxy / sxx).alias("slope"),
        (my - (sxy / sxx) * mx).alias("intercept"),
        F.sqrt(F.avg(d * d)).alias("rmse"),
        F.avg(d).alias("bias"),
        F.stddev_samp(d).alias("sd"),
    )


def _w(key: str, order: str):
    from pyspark.sql import Window
    return Window.partitionBy(key).orderBy(order)
