#!/usr/bin/env python
"""ATE from saved trajectories (reference scripts/ate_general.py):
Horn/SVD alignment of est vs gt camera positions, prints `ATE RMSE: x.xx`
(cm) and writes ../pose_eval.txt next to the est dir."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gps_slam_tpu.eval.metrics import ate_rmse_cm
from gps_slam_tpu.utils.io import read_pose_txt


def read_poses(est_dir, gt_dir):
    ests, gts = [], []
    for name in sorted(os.listdir(est_dir)):
        if not name.endswith(".txt"):
            continue
        fid = "".join(c for c in name if c.isdigit())
        gt_file = None
        for cand in (f"pose{fid}.txt", f"frame{fid}.txt", name):
            if os.path.exists(os.path.join(gt_dir, cand)):
                gt_file = os.path.join(gt_dir, cand)
                break
        if gt_file is None:
            continue
        ests.append(read_pose_txt(os.path.join(est_dir, name)))
        gts.append(read_pose_txt(gt_file))
    return ests, gts


def evaluate(est_dir, gt_dir):
    ests, gts = read_poses(est_dir, gt_dir)
    if not ests:
        print("no pose pairs found")
        return None
    # rebase gt like the reader does (frame 0 -> identity)
    gt0_inv = np.linalg.inv(gts[0])
    gts = [gt0_inv @ g for g in gts]
    ate = ate_rmse_cm(ests, gts)
    print(f"ATE RMSE: {ate:.2f}")
    with open(os.path.join(est_dir, "..", "pose_eval.txt"), "w") as f:
        print(f"ATE RMSE: {ate:.2f}", file=f)
    return ate


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--est_dir", "-e", required=True)
    parser.add_argument("--gt_dir", "-g", required=True)
    args = parser.parse_args()
    evaluate(args.est_dir, args.gt_dir)
