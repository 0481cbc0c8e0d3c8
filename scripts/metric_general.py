#!/usr/bin/env python
"""Render-vs-dataset metrics with optional valid-depth masking
(reference scripts/metric_general.py:41-100: compares a render dir against
the dataset's own frames; pixels with depth == 0 can be excluded)."""

import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

from gps_slam_tpu.eval import metrics as M


def evaluate(render_dir, dataset_dir, image_path="camera", depth_path="depth",
             depth_scale=6553.5, use_depth_mask=False):
    names = sorted(n for n in os.listdir(render_dir) if n.endswith(".color.jpg"))
    psnrs, ssims, lpipss, kept = [], [], [], []
    for n in names:
        fid = "".join(c for c in n.split("_")[0] if c.isdigit())
        gt_file = os.path.join(dataset_dir, image_path, f"frame{fid}.jpg")
        if not os.path.exists(gt_file):
            continue
        r = cv2.cvtColor(cv2.imread(os.path.join(render_dir, n)), cv2.COLOR_BGR2RGB).astype(np.float32) / 255
        g = cv2.cvtColor(cv2.imread(gt_file), cv2.COLOR_BGR2RGB).astype(np.float32) / 255
        if use_depth_mask:
            d_file = os.path.join(dataset_dir, depth_path, f"depth{fid}.png")
            if os.path.exists(d_file):
                d = cv2.imread(d_file, cv2.IMREAD_UNCHANGED).astype(np.float32) / depth_scale
                mask = d > 0
                r = np.where(mask[..., None], r, 0)
                g = np.where(mask[..., None], g, 0)
        psnrs.append(M.psnr(r, g))
        ssims.append(M.ssim(r, g))
        lpipss.append(M.lpips(r, g))
        kept.append(n)
    has_lpips = all(v is not None for v in lpipss) and lpipss
    full = {
        "SSIM": float(np.mean(ssims)) if ssims else None,
        "PSNR": float(np.mean(psnrs)) if psnrs else None,
        # explicit marker, not a silent null: no local LPIPS weights
        # (see gps_slam_tpu/eval/lpips_jax.py + tools/convert_lpips_weights.py)
        "LPIPS": float(np.mean(lpipss)) if has_lpips else "unavailable",
    }
    print(full)
    with open(os.path.join(render_dir, "..", "results.json"), "w") as f:
        json.dump(full, f, indent=True)
    return full


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--render_dir", "-r", required=True)
    parser.add_argument("--dataset_dir", "-d", required=True)
    parser.add_argument("--use_depth_mask", action="store_true")
    parser.add_argument("--depth_scale", type=float, default=6553.5)
    args = parser.parse_args()
    evaluate(args.render_dir, args.dataset_dir, use_depth_mask=args.use_depth_mask,
             depth_scale=args.depth_scale)
