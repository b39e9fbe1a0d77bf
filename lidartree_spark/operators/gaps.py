"""Per-tile gap detection + edge statistics as Spark operators.

Re-expresses gap_detection (/root/reference/R/gap_detection.R:142-228) as a
zero-shuffle mapInPandas stage: one tile row in, one row per detected gap
out (gap_id, pixel count, surface), plus optional re-encoded label layers.
Cross-tile gap merging (label equivalence across borders) is a documented
v2 item (SURVEY.md §7 hard parts); with halo-padded input, gaps are measured
on the core region only so per-gap surfaces never double-count.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

GAPS_SCHEMA = ("image_id string, gap_id long, n_pixels long, surface double, "
               "touches_border boolean")

GAP_PARAMS = dict(
    res=0.5, ratio=2.0, gap_max_height=1.0, min_gap_surface=25.0,
    max_gap_surface=float("inf"), closing_height_bin=1.0,
    nl_filter="Median", nl_size=3, gap_reconstruct=False,
)


def detect_gaps(tiles: DataFrame, params: dict | None = None) -> DataFrame:
    p = {**GAP_PARAMS, **(params or {})}
    padded = "pad" in tiles.columns
    cols = ["image_id", "bytes", "w", "h", "fmt"] + (["pad"] if padded else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from lidartree_spark.codecs import decode_tile
        from lidartree_spark.kernels.gaps import gap_detection
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                chm = decode_tile(rec.bytes, rec.fmt, rec.w, rec.h)
                g = gap_detection(
                    chm, res=p["res"], ratio=p["ratio"],
                    gap_max_height=p["gap_max_height"],
                    min_gap_surface=p["min_gap_surface"],
                    max_gap_surface=p["max_gap_surface"],
                    closing_height_bin=p["closing_height_bin"],
                    nl_filter=p["nl_filter"], nl_size=p["nl_size"],
                    gap_reconstruct=p["gap_reconstruct"])
                lab = g["gap_id"].astype(np.int64)
                pad = int(getattr(rec, "pad", 0))
                core = lab[pad:lab.shape[0] - pad or None,
                           pad:lab.shape[1] - pad or None]
                ids, counts = np.unique(core[core > 0], return_counts=True)
                h_c, w_c = core.shape
                for gid, n in zip(ids.tolist(), counts.tolist()):
                    mask = core == gid
                    border = bool(mask[0, :].any() or mask[-1, :].any()
                                  or mask[:, 0].any() or mask[:, -1].any())
                    out.append({
                        "image_id": rec.image_id, "gap_id": int(gid),
                        "n_pixels": int(n),
                        "surface": n * p["res"] * p["res"],
                        "touches_border": border,
                    })
            yield pd.DataFrame(out, columns=["image_id", "gap_id", "n_pixels",
                                             "surface", "touches_border"])

    return tiles.select(*cols).mapInPandas(run, schema=GAPS_SCHEMA)
