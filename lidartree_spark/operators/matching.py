"""Distributed tree matching: grid-bucketed candidate pruning + per-group
greedy assignment, plus confusion counts and height regression aggregates.

Scale design (SURVEY.md §2.6): the greedy assignment is inherently sequential
per group but groups are small (one tile/plot: ~10 trees), so the engine
shuffles once on the group key and runs the exact reference loop in numpy.
Two physical strategies, same semantics (parity-tested):
- match_trees: one hash shuffle, rows sorted by (key, side) within
  partitions, BATCHED grouped map (group boundaries found by slicing inside
  each Arrow batch — per-group cost is a numpy slice, not an Arrow round
  trip). The scale default; the group key is the skew unit and AQE covers
  hot spots.
- detect_and_match: broadcast the (small) inventory into the detection
  stage — the whole pipeline fuses to one zero-shuffle map. Best when the
  corpus >> inventory and per-core counts dominate (single-executor edge).
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

    # One shuffle on the group key, rows sorted (key, side, oid) within each
    # partition, then a BATCHED grouped map: plain slicing finds group
    # boundaries inside each Arrow batch, so the per-group cost is a numpy
    # slice instead of a full Arrow->pandas round trip (the cogroup path
    # paid ~2-4 ms of conversion per tile, dominating matching time at
    # ~10 trees/group). Groups can span Arrow batches; the trailing group of
    # every batch is carried into the next, so memory stays O(batch), not
    # O(partition).
    r = ref.select(F.col(key).alias("k"), F.lit(0).alias("side"),
                   F.col("tree_id").cast("long").alias("oid"), "x", "y", "h")
    d = det.select(F.col(key).alias("k"), F.lit(1).alias("side"),
                   F.col("id").cast("long").alias("oid"), "x", "y", "h")
    u = (r.unionByName(d)
         .repartition("k")
         .sortWithinPartitions("k", "side", "oid"))

    def run(batches):
        import numpy as np
        from lidartree_spark.kernels.matching import tree_matching
        cols = ["image_id", "r", "d", "h_diff", "plan_diff"]

        def process(pdf: pd.DataFrame):
            keys = pdf["k"].to_numpy()
            side = pdf["side"].to_numpy()
            xyz = pdf[["x", "y", "h"]].to_numpy()
            starts = np.concatenate(
                [[0], np.nonzero(keys[1:] != keys[:-1])[0] + 1, [len(keys)]])
            out_k, out_r, out_d, out_hd, out_pd = [], [], [], [], []
            for a, b in zip(starts[:-1], starts[1:]):
                s = side[a:b]
                n_ref = int((s == 0).sum())
                if n_ref == 0 or n_ref == b - a:
                    continue  # one side empty -> no matches (cogroup parity)
                lr = xyz[a:a + n_ref]
                ld = xyz[a + n_ref:b]
                for p in tree_matching(lr, ld, delta_ground=delta_ground,
                                       h_prec=h_prec):
                    out_k.append(keys[a])
                    out_r.append(int(p["r"]))
                    out_d.append(int(p["d"]))
                    out_hd.append(p["h_diff"])
                    out_pd.append(p["plan_diff"])
            if not out_k:
                return None
            return pd.DataFrame({"image_id": out_k, "r": out_r, "d": out_d,
                                 "h_diff": out_hd, "plan_diff": out_pd},
                                columns=cols)

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            keys = pdf["k"].to_numpy()
            tail = keys == keys[-1]
            cut = len(keys) - int(tail.sum())
            carry = pdf.iloc[cut:]
            body = pdf.iloc[:cut]
            res = process(body) if len(body) else None
            if res is not None:
                yield res
        if carry is not None and len(carry):
            res = process(carry)
            if res is not None:
                yield res

    return u.mapInPandas(run, schema=MATCH_SCHEMA)


def detect_and_match(tiles: DataFrame, ref: DataFrame,
                     params: dict | None = None,
                     delta_ground: float = 2.1, h_prec: float = 0.14,
                     key: str = "image_id") -> DataFrame:
    """Fused detect + match with a BROADCAST inventory: the whole flagship
    pipeline collapses to one zero-shuffle mapInPandas stage.

    This is the map-side broadcast-join strategy for the (common) case where
    the reference inventory is a small dimension table (field plots: 10^3 -
    10^6 rows) against a huge tile corpus — the same small-side tradeoff
    Catalyst makes for broadcast hash joins. For inventories too big to
    broadcast, `match_trees` is the shuffle path (grid-bucketed cogroup).
    Semantics identical to detect_trees + match_trees (asserted in
    tests/test_spark_pipeline.py)."""
    from lidartree_spark.operators.detection import DEFAULT_PARAMS

    p = {**DEFAULT_PARAMS, **(params or {})}
    ref_pdf = (ref.select(key, "tree_id", "x", "y", "h")
               .toPandas().sort_values([key, "tree_id"]))
    ref_groups = {k: g[["x", "y", "h"]].to_numpy()
                  for k, g in ref_pdf.groupby(key, sort=False)}
    bc = tiles.sparkSession.sparkContext.broadcast(ref_groups)
    padded = "pad" in tiles.columns
    cols = ["image_id", "bytes", "w", "h", "fmt"] + (["pad"] if padded else [])

    def run(batches):
        import numpy as np
        from lidartree_spark.codecs import decode_tile
        from lidartree_spark.generator import parse_tile_id, tile_origin
        from lidartree_spark.kernels.extraction import tree_extraction
        from lidartree_spark.kernels.matching import tree_matching
        from lidartree_spark.kernels.segmentation import tree_segmentation
        groups = bc.value
        res = p["res"]
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                lr = groups.get(rec.image_id)
                if lr is None or not len(lr):
                    continue
                chm = decode_tile(rec.bytes, rec.fmt, rec.w, rec.h)
                seg = tree_segmentation(
                    chm, res=res, nl_filter=p["nl_filter"],
                    nl_size=p["nl_size"], sigma=p["sigma"],
                    max_width=p["max_width"], hmin=p["hmin"], dmin=p["dmin"],
                    dprop=p["dprop"], prop=p["prop"],
                    min_value=p["min_value"])
                row, col = parse_tile_id(rec.image_id)
                pad = int(getattr(rec, "pad", 0))
                w_core, h_core = rec.w - 2 * pad, rec.h - 2 * pad
                x0, y1 = tile_origin(row, col, w_core, h_core, res)
                rows = tree_extraction(
                    seg["filled_dem"], seg["local_maxima"],
                    seg["segments_id"], x0=x0 - pad * res,
                    y1=y1 + pad * res, res=res)
                if pad:
                    x1 = x0 + w_core * res
                    y0 = y1 - h_core * res
                    rows = [r for r in rows
                            if x0 <= r["x"] < x1 and y0 <= r["y"] < y1]
                if not rows:
                    continue
                rows.sort(key=lambda r: r["id"])
                ld = np.array([[r["x"], r["y"], r["h"]] for r in rows])
                for m in tree_matching(lr, ld, delta_ground=delta_ground,
                                       h_prec=h_prec):
                    out.append({"image_id": rec.image_id,
                                "r": int(m["r"]), "d": int(m["d"]),
                                "h_diff": m["h_diff"],
                                "plan_diff": m["plan_diff"]})
            yield pd.DataFrame(out, columns=["image_id", "r", "d",
                                             "h_diff", "plan_diff"])

    return tiles.select(*cols).mapInPandas(run, schema=MATCH_SCHEMA)


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
