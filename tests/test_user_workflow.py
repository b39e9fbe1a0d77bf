"""tools/user_workflow.py — the complete migrating-user story on the
reference's own bundled .laz, with every input/output in a real user
format (.laz in; .shp inventory; GeoTIFF + .shp out)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHABLAIS3 = "/root/reference/inst/extdata/las_chablais3.laz"


@pytest.mark.skipif(not os.path.exists(CHABLAIS3),
                    reason="reference .laz not present")
def test_user_workflow_end_to_end(tmp_path):
    import json

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "user_workflow.py"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=420, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_points"] == 92097
    assert summary["n_trees"] > 150          # dense Chablais forest plot
    # the synthesized inventory is a subset of the detections, so the
    # greedy matcher must pair every single one — an end-to-end sanity
    # identity across .shp write -> read -> match
    assert summary["n_matched"] == summary["n_inventory"] > 50
    assert summary["n_chm_tiles"] == 9       # 3x3 grid of 32 m tiles

    # outputs exist in their native formats and re-open cleanly
    from lidartree_spark.shp import read_shapefile
    from lidartree_spark.tiff import decode_geotiff
    det = read_shapefile(summary["outputs"]["detections"])
    assert len(det) == summary["n_trees"]
    assert {"x", "y", "z", "image_id"} <= set(det.columns)
    tifs = sorted(os.listdir(summary["outputs"]["chm_tiles"]))
    assert len(tifs) == 9
    with open(os.path.join(summary["outputs"]["chm_tiles"],
                           tifs[0]), "rb") as f:
        arr, geo = decode_geotiff(f.read())
    assert arr.shape == (64, 64) and geo["res_x"] == 0.5
