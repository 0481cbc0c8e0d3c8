#!/usr/bin/env python
"""Mesh reconstruction metrics (reference scripts/geo_general.py): sample
the reconstructed and ground-truth meshes, report accuracy/completion (cm)
and precision/recall/F1 at distance thresholds."""

import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gps_slam_tpu.eval.metrics import geometry_metrics, sample_mesh_surface
from gps_slam_tpu.utils.io import read_mesh_ply


def evaluate(rec_meshfile, gt_meshfile, sample_nums=1000000, dist_thres=(0.03,),
             out_path=None):
    rv, _, rf = read_mesh_ply(rec_meshfile)
    gv, _, gf = read_mesh_ply(gt_meshfile)
    rng = np.random.default_rng(0)
    rec_pts = (
        sample_mesh_surface(rv, rf, sample_nums, rng)
        if len(rf)
        else rv[rng.integers(0, len(rv), min(sample_nums, len(rv)))]
    )
    gt_pts = sample_mesh_surface(gv, gf, sample_nums, rng)
    results = geometry_metrics(rec_pts, gt_pts, dist_thres)
    print(results)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=True)
    return results


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--rec_mesh", "-r", required=True)
    parser.add_argument("--gt_mesh", "-g", required=True)
    parser.add_argument("--samples", type=int, default=1000000)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    evaluate(args.rec_mesh, args.gt_mesh, args.samples, out_path=args.out)
