"""Pure-numpy raster kernels — the vectorized execution layer inside pandas
UDFs AND the deterministic test oracle (one implementation, self-consistent).

Each kernel is a from-scratch re-derivation of the semantics of the reference
R package lidaRtRee 4.0.8 (file:line cited in each docstring), NOT a
translation of its imager/terra C++ internals.
"""

from lidartree_spark.kernels.morphology import (  # noqa: F401
    create_disk,
    grey_dilate,
    grey_erode,
    grey_closing,
    median_filter,
    gaussian_smooth,
    pad_edge,
    unpad,
)
from lidartree_spark.kernels.detection import (  # noqa: F401
    dem_filtering,
    maxima_detection,
    maxima_selection,
)
from lidartree_spark.kernels.segmentation import (  # noqa: F401
    watershed,
    segmentation,
    raster_zonal_stats,
    seg_adjust,
    tree_segmentation,
    label_components,
)
from lidartree_spark.kernels.extraction import tree_extraction, crown_wkt  # noqa: F401
from lidartree_spark.kernels.matching import tree_matching, hist_detection  # noqa: F401
from lidartree_spark.kernels.stats import quantile_type7, gini, plane_metrics  # noqa: F401
