"""Coregistration of field plots against the CHM: cogrouped moving
correlation (one shuffle, one UDF row per plot) — the Spark lifecycle of
SURVEY.md §3.2, re-deriving /root/reference/R/coregistration.R:396-430.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

COREG_SCHEMA = ("image_id string, max1 double, dx1 double, dy1 double, "
                "dx2 double, dy2 double, ratiomax1max2 double, "
                "rmedloc1 double, rmedloc2 double, rquanta double, "
                "rquantb double")


def coregister(tiles: DataFrame, trees: DataFrame, buffer: float = 4.0,
               step: float = 0.5, dm: float = 2.0,
               res: float = 0.5) -> DataFrame:
    """Per tile/plot: rasterize inventory trees to a virtual CHM (max per
    cell, NA->0, coregistration.R:405-410), compute the translation
    correlation surface (:413-414) and its local-max statistics (:416).

    `tiles` needs (image_id, bytes, w, h, fmt); `trees` needs
    (image_id, x, y, h) map coordinates.
    """

    def run(key, tiles_pdf: pd.DataFrame, trees_pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        from lidartree_spark.codecs import decode_tile
        from lidartree_spark.generator import parse_tile_id, tile_origin
        from lidartree_spark.kernels.coreg import (
            raster_local_max,
            rasters_moving_cor,
        )
        cols = ["image_id", "max1", "dx1", "dy1", "dx2", "dy2",
                "ratiomax1max2", "rmedloc1", "rmedloc2", "rquanta", "rquantb"]
        if tiles_pdf.empty or trees_pdf.empty:
            return pd.DataFrame(columns=cols)
        rec = next(tiles_pdf.itertuples(index=False))
        chm = np.nan_to_num(
            decode_tile(rec.bytes, rec.fmt, rec.w, rec.h), nan=0.0)
        row, col = parse_tile_id(rec.image_id)
        x0, y1 = tile_origin(row, col, rec.w, rec.h, res)
        # rasterize trees: cell = max height (terra::rasterize fun=max)
        virtual = np.zeros_like(chm)
        xs = np.floor((trees_pdf["x"].to_numpy() - x0) / res).astype(int)
        ys = np.floor((y1 - trees_pdf["y"].to_numpy()) / res).astype(int)
        hs = trees_pdf["h"].to_numpy()
        ok = (xs >= 0) & (xs < rec.w) & (ys >= 0) & (ys < rec.h)
        np.maximum.at(virtual, (ys[ok], xs[ok]), hs[ok])
        rows = rasters_moving_cor(chm, virtual, buffer=buffer, step=step,
                                  res=res)
        stats = raster_local_max(rows, step=step, dm=dm)
        if stats is None:
            return pd.DataFrame(columns=cols)
        stats["image_id"] = key[0]
        return pd.DataFrame([stats], columns=cols)

    return (tiles.select("image_id", "bytes", "w", "h", "fmt")
            .groupBy("image_id")
            .cogroup(trees.select("image_id", "x", "y", "h")
                     .groupBy("image_id"))
            .applyInPandas(run, schema=COREG_SCHEMA))
